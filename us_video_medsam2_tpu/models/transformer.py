"""Attention modules: projected SDPA, RoPE attention, and the SAM two-way transformer.

Parity targets: reference sam2/modeling/sam/transformer.py:44-360. Everything is
batch-first [B, N, C]; softmax statistics are f32.

RoPEAttention here takes the (cos, sin) axial tables as explicit call arguments —
unlike the reference, which mutates a cached `freqs_cis` buffer per feature size
(transformer.py:326-333) — so the module stays pure and jit/scan-friendly. The
`num_k_exclude_rope` behaviour (object-pointer tokens are not rotated,
transformer.py:332-338) becomes a static `rope_k_len`: keys beyond that length are
passed through unrotated.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from us_video_medsam2_tpu.models.layers import MLP
from us_video_medsam2_tpu.ops.attention import sdpa
from us_video_medsam2_tpu.ops.posenc import apply_rope_halfsplit


class Attention(nn.Module):
    """Multi-head attention with optional internal downsampling and kv input dim.

    (reference transformer.py:215-287)
    """

    embedding_dim: int
    num_heads: int
    downsample_rate: int = 1
    kv_in_dim: Optional[int] = None
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def _heads(self, x):
        b, n, c = x.shape
        return x.reshape(b, n, self.num_heads, c // self.num_heads).transpose(0, 2, 1, 3)

    @nn.compact
    def __call__(self, q, k, v, key_mask=None, deterministic: bool = True):
        internal_dim = self.embedding_dim // self.downsample_rate
        q = nn.Dense(internal_dim, dtype=self.dtype, name="q_proj")(q)
        k = nn.Dense(internal_dim, dtype=self.dtype, name="k_proj")(k)
        v = nn.Dense(internal_dim, dtype=self.dtype, name="v_proj")(v)
        out = sdpa(self._heads(q), self._heads(k), self._heads(v), key_mask=key_mask)
        b, h, n, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        return nn.Dense(self.embedding_dim, dtype=self.dtype, name="out_proj")(out)


class RoPEAttention(nn.Module):
    """Attention with axial rotary embedding on q and (part of) k.

    (reference transformer.py:289-360)
    """

    embedding_dim: int
    num_heads: int
    downsample_rate: int = 1
    kv_in_dim: Optional[int] = None
    dropout: float = 0.0
    force_flash: bool = False
    dtype: jnp.dtype = jnp.float32

    def _heads(self, x):
        b, n, c = x.shape
        return x.reshape(b, n, self.num_heads, c // self.num_heads).transpose(0, 2, 1, 3)

    @nn.compact
    def __call__(
        self,
        q,
        k,
        v,
        rope_cos,
        rope_sin,
        rope_k_len: Optional[int] = None,
        rope_k_repeat: bool = False,
        key_mask=None,
        deterministic: bool = True,
        landmark_pool: int = 0,
        spatial_hw: Optional[tuple] = None,
        landmark_variant: int = 1,
    ):
        """landmark_pool > 1 enables EfficientTAM's landmark cross-attention:
        the rotated spatial-memory K/V are avg-pooled (landmark_pool x) per
        memory slot, while object-pointer tokens stay unpooled. The area
        compensation differs per variant (reference
        efficient_track_anything/modeling/sam/transformer.py):
          variant 1 (:369-424): +2*log(pool) as a LOGIT bias on landmark cols;
          variant 2 (:430-532): 2*log(pool) added to the pooled K VALUES
            themselves before a plain SDPA (the logit offset then scales with
            sum_d q_d — faithfully ported, quirk and all)."""
        internal_dim = self.embedding_dim // self.downsample_rate
        q = nn.Dense(internal_dim, dtype=self.dtype, name="q_proj")(q)
        k = nn.Dense(internal_dim, dtype=self.dtype, name="k_proj")(k)
        v = nn.Dense(internal_dim, dtype=self.dtype, name="v_proj")(v)
        q, k, v = self._heads(q), self._heads(k), self._heads(v)

        # Half-split RoPE (q/k projections are channel-permuted by the importer,
        # ops/posenc.py::rope_halfsplit_perm): key tables are tiled over repeated
        # memory slots and identity-extended (cos=1, sin=0) over object-pointer
        # tokens, so there is no per-layer slice+concat of the key tensor — the
        # extended tables are layer-invariant and CSE'd across the stack.
        q = apply_rope_halfsplit(q, rope_cos, rope_sin)
        lk = k.shape[-2]
        n_rope = lk if rope_k_len is None else rope_k_len
        l0 = rope_cos.shape[0]
        if n_rope == lk and not rope_k_repeat:
            cos_k, sin_k = rope_cos, rope_sin
        else:
            reps = n_rope // l0
            cos_k = jnp.tile(rope_cos, (reps, 1)) if reps > 1 else rope_cos
            sin_k = jnp.tile(rope_sin, (reps, 1)) if reps > 1 else rope_sin
            if n_rope < lk:
                d2 = cos_k.shape[1]
                cos_k = jnp.concatenate(
                    [cos_k, jnp.ones((lk - n_rope, d2), cos_k.dtype)]
                )
                sin_k = jnp.concatenate(
                    [sin_k, jnp.zeros((lk - n_rope, d2), sin_k.dtype)]
                )
        k = apply_rope_halfsplit(k, cos_k, sin_k)

        if landmark_pool > 1 and n_rope > q.shape[-2]:
            out = self._landmark_attention(
                q, k, v, n_rope, landmark_pool, spatial_hw, key_mask,
                variant=landmark_variant,
            )
        elif self.dropout > 0.0 and not deterministic:
            # attention-weight dropout (reference transformer.py:340-344). The
            # training flash kernel (kernels/flash_dropout.py) keeps the score
            # matrix tile-resident in fwd AND bwd; its coordinate-hash dropout
            # mask is reused by the XLA fallback below, so CPU and TPU draw the
            # identical pattern for a given rng key.
            from us_video_medsam2_tpu.kernels.flash_dropout import (
                flash_attention_train_remat,
                flash_train_available,
                keep_mask_reference,
            )

            seed = jax.lax.bitcast_convert_type(
                jax.random.bits(self.make_rng("dropout"), (), "uint32"), jnp.int32
            )
            if flash_train_available(q.shape, k.shape, k.dtype):
                # remat-savable form: the enclosing train-step checkpoint
                # saves the fwd (out, lse) instead of re-running the fwd
                # kernel in backward (train_model.py passes the policy)
                out = flash_attention_train_remat(
                    q, k, v, key_mask, seed, self.dropout
                )
            else:
                bsz, h, lq, d_h = q.shape
                lk = k.shape[-2]
                logits = jnp.einsum(
                    "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
                ) * (d_h**-0.5)
                if key_mask is not None:
                    logits = jnp.where(key_mask[:, None, None, :], logits, -1e30)
                probs = jax.nn.softmax(logits, axis=-1)
                keep = keep_mask_reference(
                    bsz * h, lq, lk, seed, self.dropout
                ).reshape(bsz, h, lq, lk)
                probs = jnp.where(keep, probs / (1.0 - self.dropout), 0.0)
                out = jnp.einsum(
                    "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                    preferred_element_type=jnp.float32,
                ).astype(q.dtype)
        else:
            out = sdpa(q, k, v, key_mask=key_mask, force_flash=self.force_flash)
        b, h, n, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        return nn.Dense(self.embedding_dim, dtype=self.dtype, name="out_proj")(out)

    @staticmethod
    def _landmark_attention(q, k, v, n_rope, pool, spatial_hw, key_mask, variant=1):
        import math

        from us_video_medsam2_tpu.ops.attention import NEG_INF

        b, nh, lq, d = q.shape
        hh, ww = spatial_hw
        n_slots = n_rope // (hh * ww)

        def pool_tokens(x):  # [B, H, n_rope, d] -> [B, H, n_rope/pool^2, d]
            xs = x[:, :, :n_rope].reshape(b, nh, n_slots, hh // pool, pool, ww // pool, pool, d)
            return xs.mean(axis=(4, 6)).reshape(b, nh, -1, d)

        k_land = pool_tokens(k)
        v_land = pool_tokens(v)
        if variant == 2:
            # EfficientRoPEAttention2 (:430-532): area compensation as a VALUE
            # offset on the pooled keys, then plain SDPA (no logit bias)
            k_land = k_land + 2.0 * math.log(pool)
        k_full = jnp.concatenate([k_land, k[:, :, n_rope:]], axis=2)
        v_full = jnp.concatenate([v_land, v[:, :, n_rope:]], axis=2)

        scale = 1.0 / math.sqrt(d)
        logits = (
            jnp.einsum("bhqd,bhkd->bhqk", q, k_full, preferred_element_type=jnp.float32)
            * scale
        )
        n_land = k_land.shape[2]
        if variant == 1:
            bias = jnp.concatenate(
                [
                    jnp.full((n_land,), 2.0 * math.log(pool), jnp.float32),
                    jnp.zeros((k.shape[2] - n_rope,), jnp.float32),
                ]
            )
            logits = logits + bias[None, None, None, :]
        if key_mask is not None:
            # pool the mask: slot validity is uniform over its tokens
            m_sp = key_mask[:, :n_rope].reshape(b, n_slots, hh * ww)[:, :, :: pool * pool]
            m = jnp.concatenate([m_sp.reshape(b, -1), key_mask[:, n_rope:]], axis=1)
            logits = jnp.where(m[:, None, None, :], logits, NEG_INF)
        probs = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum(
            "bhqk,bhkd->bhqd", probs.astype(v.dtype), v_full,
            preferred_element_type=jnp.float32,
        ).astype(q.dtype)


class TwoWayAttentionBlock(nn.Module):
    """Sparse self-attn, sparse->dense cross, MLP, dense->sparse cross.

    (reference transformer.py:137-212)
    """

    embedding_dim: int
    num_heads: int
    mlp_dim: int = 2048
    activation: Callable = jax.nn.relu
    attention_downsample_rate: int = 2
    skip_first_layer_pe: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name)
        if self.skip_first_layer_pe:
            queries = Attention(
                self.embedding_dim, self.num_heads, dtype=self.dtype, name="self_attn"
            )(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + Attention(
                self.embedding_dim, self.num_heads, dtype=self.dtype, name="self_attn"
            )(q, q, queries)
        queries = ln("norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + Attention(
            self.embedding_dim,
            self.num_heads,
            downsample_rate=self.attention_downsample_rate,
            dtype=self.dtype,
            name="cross_attn_token_to_image",
        )(q, k, keys)
        queries = ln("norm2")(queries)

        queries = queries + MLP(
            hidden_dim=self.mlp_dim,
            output_dim=self.embedding_dim,
            num_layers=2,
            activation=self.activation,
            dtype=self.dtype,
            name="mlp",
        )(queries)
        queries = ln("norm3")(queries)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + Attention(
            self.embedding_dim,
            self.num_heads,
            downsample_rate=self.attention_downsample_rate,
            dtype=self.dtype,
            name="cross_attn_image_to_token",
        )(k, q, queries)
        keys = ln("norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    """Depth-2 token<->image decoder transformer (reference transformer.py:44-134)."""

    depth: int = 2
    embedding_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        """image_embedding/image_pe: [B, HW, C]; point_embedding: [B, N, C]."""
        queries = point_embedding
        keys = image_embedding
        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                embedding_dim=self.embedding_dim,
                num_heads=self.num_heads,
                mlp_dim=self.mlp_dim,
                attention_downsample_rate=self.attention_downsample_rate,
                skip_first_layer_pe=(i == 0),
                dtype=self.dtype,
                name=f"layers_{i}",
            )(queries, keys, point_embedding, image_pe)

        q = queries + point_embedding
        k = keys + image_pe
        queries = queries + Attention(
            self.embedding_dim,
            self.num_heads,
            downsample_rate=self.attention_downsample_rate,
            dtype=self.dtype,
            name="final_attn_token_to_image",
        )(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_final_attn")(
            queries
        )
        return queries, keys
