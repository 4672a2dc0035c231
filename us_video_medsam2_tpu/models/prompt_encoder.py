"""SAM prompt encoder (reference sam2/modeling/sam/prompt_encoder.py:17-182).

JIT-friendly recast: prompts always arrive as fixed-shape padded tensors —
[B, P, 2] point coords with [B, P] labels where -1 marks padding (exactly the
reference's padded-point convention, prompt_encoder.py:88-96); boxes are the
two-point (label 2/3) encoding the reference itself uses for video training
(sam2_utils.py:156-199). Label-conditional embedding add becomes a table gather.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from us_video_medsam2_tpu.models.layers import Conv2d, LayerNorm, gelu_exact


class PromptEncoder(nn.Module):
    embed_dim: int = 256
    image_embedding_size: int = 32
    input_image_size: int = 512
    mask_in_chans: int = 16
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        # random-Fourier gaussian matrix (fixed at init, std-normal * scale=1.0)
        self.pe_gaussian = self.param(
            "pe_gaussian",
            nn.initializers.normal(stddev=1.0),
            (2, self.embed_dim // 2),
        )
        # rows: [not_a_point(-1), neg(0), pos(1), box_tl(2), box_br(3)]
        self.point_embed = self.param(
            "point_embed",
            nn.initializers.normal(stddev=1.0),
            (5, self.embed_dim),
        )
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(stddev=1.0), (self.embed_dim,)
        )
        ch = self.mask_in_chans
        self.mask_down_conv1 = Conv2d(ch // 4, 2, stride=2, dtype=self.dtype, name="mask_down_conv1")
        self.mask_down_ln1 = LayerNorm(eps=1e-6, dtype=self.dtype, name="mask_down_ln1")
        self.mask_down_conv2 = Conv2d(ch, 2, stride=2, dtype=self.dtype, name="mask_down_conv2")
        self.mask_down_ln2 = LayerNorm(eps=1e-6, dtype=self.dtype, name="mask_down_ln2")
        self.mask_down_conv3 = Conv2d(self.embed_dim, 1, dtype=self.dtype, name="mask_down_conv3")

    def _pe_encoding(self, coords: jnp.ndarray) -> jnp.ndarray:
        """coords normalized to [0,1]^2, [..., 2] -> [..., embed_dim]."""
        c = (2.0 * coords - 1.0).astype(jnp.float32)
        c = c @ self.pe_gaussian.astype(jnp.float32)
        c = 2.0 * jnp.pi * c
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1).astype(self.dtype)

    def dense_pe(self) -> jnp.ndarray:
        """[H, W, embed_dim] positional grid for the mask decoder."""
        s = self.image_embedding_size
        y = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
        x = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
        grid = jnp.stack(
            [jnp.tile(x[None, :], (s, 1)), jnp.tile(y[:, None], (1, s))], axis=-1
        )
        return self._pe_encoding(grid)

    def embed_points(self, coords: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
        """coords [B, P, 2] absolute pixels; labels [B, P] in {-1,0,1,2,3}."""
        pts = (coords.astype(jnp.float32) + 0.5) / self.input_image_size
        pe = self._pe_encoding(pts)
        pe = jnp.where((labels == -1)[..., None], 0.0, pe)
        # jnp (not numpy) so tracer indices work under vmap batching too
        table = jnp.asarray(self.point_embed).astype(self.dtype)
        idx = jnp.clip(labels + 1, 0, 4)
        return pe + table[idx]

    def embed_masks(self, masks: jnp.ndarray) -> jnp.ndarray:
        """masks [B, 4H, 4W, 1] -> dense embedding [B, H, W, embed_dim]."""
        x = self.mask_down_conv1(masks.astype(self.dtype))
        x = gelu_exact(self.mask_down_ln1(x))
        x = self.mask_down_conv2(x)
        x = gelu_exact(self.mask_down_ln2(x))
        return self.mask_down_conv3(x)

    def no_mask_dense(self, batch: int) -> jnp.ndarray:
        s = self.image_embedding_size
        return jnp.broadcast_to(
            self.no_mask_embed.astype(self.dtype)[None, None, None, :],
            (batch, s, s, self.embed_dim),
        )

    def __call__(
        self,
        point_coords: jnp.ndarray,
        point_labels: jnp.ndarray,
        masks: Optional[jnp.ndarray] = None,
        pad: bool = True,
    ):
        if pad:
            # reference always appends one padding point when no box prompt is
            # present (prompt_encoder.py:86-91) — token count matters to attention
            b = point_coords.shape[0]
            point_coords = jnp.concatenate(
                [point_coords, jnp.zeros((b, 1, 2), point_coords.dtype)], axis=1
            )
            point_labels = jnp.concatenate(
                [point_labels, -jnp.ones((b, 1), point_labels.dtype)], axis=1
            )
        sparse = self.embed_points(point_coords, point_labels)
        if masks is not None:
            dense = self.embed_masks(masks)
        else:
            dense = self.no_mask_dense(point_coords.shape[0])
        return sparse, dense
