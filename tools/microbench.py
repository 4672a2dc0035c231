"""Micro-benchmarks for hot components on the real TPU.

Times each variant as a jitted lax.scan of ITERS applications (amortizes the
tunnel dispatch cost); completion forced with a host fetch. Used to attribute
wins/regressions per component before they reach bench.py.

Usage: python tools/microbench.py [names...]   (default: all)
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 400


def timeit(name, fn, *args, iters=ITERS):
    """fn must map args -> args-like pytree (so it can scan); returns ms/iter."""

    @jax.jit
    def scanned(x):
        def body(c, _):
            return fn(*c), None

        out, _ = jax.lax.scan(body, x, None, length=iters)
        # reduce to a scalar on device so the host fetch is 4 bytes, not the
        # full output (tunnel transfer would otherwise dominate the timing)
        return jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32))

    np.asarray(scanned(args))  # compile + warm; fetch = true completion
    t0 = time.perf_counter()
    np.asarray(scanned(args))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:50s} {dt:8.3f} ms/iter")
    return dt


# ---------------------------------------------------------------- patch embed
def bench_patch_embed():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 512, 512, 3)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((7, 7, 3, 96)), jnp.bfloat16)

    def conv(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (4, 4), ((3, 3), (3, 3)), dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return x + jnp.mean(y).astype(x.dtype), w

    def im2col(x, w):
        xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        cols = [
            xp[:, ki : ki + 509 : 4, kj : kj + 509 : 4, :]
            for ki in range(7)
            for kj in range(7)
        ]
        p = jnp.concatenate(cols, axis=-1)
        y = jax.lax.dot_general(
            p.reshape(-1, 147), w.reshape(147, 96), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(1, 128, 128, 96)
        return x + jnp.mean(y).astype(x.dtype), w

    def s2d(x, w):
        b = x.shape[0]
        # space-to-depth 4x: [B,512,512,3] -> [B,128,128,48]
        xs = x.reshape(b, 128, 4, 128, 4, 3).transpose(0, 1, 3, 2, 4, 5).reshape(b, 128, 128, 48)
        xs = jnp.pad(xs, ((0, 0), (1, 0), (1, 0), (0, 0)))
        p = jnp.concatenate(
            [xs[:, :128, :128], xs[:, :128, 1:], xs[:, 1:, :128], xs[:, 1:, 1:]], axis=-1
        )  # [B,128,128,192] cells (i-1,j-1),(i-1,j),(i,j-1),(i,j)
        # kernel scatter: w[ki,kj,c,o] -> w2[cell_i,cell_j, ri,rj, c, o]
        w2 = jnp.zeros((2, 2, 4, 4, 3, 96), w.dtype)
        for di in range(2):  # 0 = cell i-1 (ki=ri-1), 1 = cell i (ki=ri+3)
            for dj in range(2):
                for ri in range(4):
                    for rj in range(4):
                        ki = ri - 1 if di == 0 else ri + 3
                        kj = rj - 1 if dj == 0 else rj + 3
                        if 0 <= ki < 7 and 0 <= kj < 7:
                            w2 = w2.at[di, dj, ri, rj].set(w[ki, kj])
        wmat = w2.reshape(2, 2, 48, 96).reshape(192, 96)
        y = jax.lax.dot_general(
            p.reshape(-1, 192), wmat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(b, 128, 128, 96)
        return x + jnp.mean(y).astype(x.dtype), w

    timeit("patch_embed conv7x7s4", conv, x, w)
    timeit("patch_embed im2col49", im2col, x, w)
    timeit("patch_embed s2d+2x2", s2d, x, w)


# ------------------------------------------------------------ mask downsampler
def bench_mask_down():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 512, 512, 1)), jnp.bfloat16)
    ws = [
        jnp.asarray(rng.standard_normal((3, 3, 1, 4)) * 0.2, jnp.bfloat16),
        jnp.asarray(rng.standard_normal((3, 3, 4, 16)) * 0.2, jnp.bfloat16),
        jnp.asarray(rng.standard_normal((3, 3, 16, 64)) * 0.2, jnp.bfloat16),
        jnp.asarray(rng.standard_normal((3, 3, 64, 256)) * 0.2, jnp.bfloat16),
    ]

    def convs(x, *ws):
        y = x
        for w in ws:
            y = jax.lax.conv_general_dilated(
                y, w, (2, 2), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
            ).astype(jnp.bfloat16)
            y = jax.nn.gelu(y)
        # keep input shape for scan: upsample back cheaply
        return (jnp.mean(y) + x, *ws)

    def im2col(x, *ws):
        y = x
        for w in ws:
            kh, kw, cin, cout = w.shape
            yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))
            ho = y.shape[1] // 2
            cols = [
                yp[:, ki : ki + 2 * (ho - 1) + 1 : 2, kj : kj + 2 * (ho - 1) + 1 : 2, :]
                for ki in range(3)
                for kj in range(3)
            ]
            p = jnp.concatenate(cols, axis=-1)
            y = jax.lax.dot_general(
                p.reshape(-1, 9 * cin), w.reshape(9 * cin, cout),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            ).reshape(1, ho, ho, cout).astype(jnp.bfloat16)
            y = jax.nn.gelu(y)
        return (jnp.mean(y) + x, *ws)

    def s2d(x, *ws):
        y = x
        for w in ws:
            kh, kw, cin, cout = w.shape
            h = y.shape[1]
            # s2d 2x: [B,h,h,c] -> [B,h/2,h/2,4c]; 3x3 s2 conv -> 2x2 cell conv
            b = y.shape[0]
            yc = y.reshape(b, h // 2, 2, h // 2, 2, cin).transpose(0, 1, 3, 2, 4, 5)
            yc = yc.reshape(b, h // 2, h // 2, 4 * cin)
            yc = jnp.pad(yc, ((0, 0), (1, 0), (1, 0), (0, 0)))
            n = h // 2
            p = jnp.concatenate(
                [yc[:, :n, :n], yc[:, :n, 1:], yc[:, 1:, :n], yc[:, 1:, 1:]], axis=-1
            )  # [B,n,n,16cin]
            w2 = jnp.zeros((2, 2, 2, 2, cin, cout), w.dtype)
            for di in range(2):
                for dj in range(2):
                    for ri in range(2):
                        for rj in range(2):
                            ki = ri - 1 if di == 0 else ri + 1
                            kj = rj - 1 if dj == 0 else rj + 1
                            if 0 <= ki < 3 and 0 <= kj < 3:
                                w2 = w2.at[di, dj, ri, rj].set(w[ki, kj])
            wmat = w2.reshape(16 * cin, cout)
            y = jax.lax.dot_general(
                p.reshape(-1, 16 * cin), wmat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(b, n, n, cout).astype(jnp.bfloat16)
            y = jax.nn.gelu(y)
        return (jnp.mean(y) + x, *ws)

    timeit("mask_down 4x conv3x3s2", convs, x, *ws)
    timeit("mask_down 4x im2col", im2col, x, *ws)
    timeit("mask_down 4x s2d+2x2", s2d, x, *ws)


# ------------------------------------------------------------- attention layout
def bench_attn_layout():
    rng = np.random.default_rng(0)
    # stage-3-like: 16 windows x 196 tokens, 4 heads x 96
    for (nw, t, h, d) in [(16, 196, 4, 96), (64, 64, 2, 96), (1, 1024, 4, 96)]:
        qkv = jnp.asarray(rng.standard_normal((nw, t, 3 * h * d)), jnp.bfloat16)

        def bhld(qkv):
            q, k, v = jnp.split(qkv.reshape(nw, t, 3, h, d), 3, axis=2)
            q = q.squeeze(2).transpose(0, 2, 1, 3)
            k = k.squeeze(2).transpose(0, 2, 1, 3)
            v = v.squeeze(2).transpose(0, 2, 1, 3)
            s = jnp.einsum("whqd,whkd->whqk", q, k, preferred_element_type=jnp.float32)
            p = jax.nn.softmax(s * (d**-0.5), axis=-1).astype(v.dtype)
            o = jnp.einsum("whqk,whkd->whqd", p, v, preferred_element_type=jnp.float32)
            o = o.astype(jnp.bfloat16).transpose(0, 2, 1, 3).reshape(nw, t, h * d)
            return (jnp.concatenate([o, o, o], axis=-1),)

        def blhd(qkv):
            q, k, v = jnp.split(qkv.reshape(nw, t, 3, h, d), 3, axis=2)
            q, k, v = q.squeeze(2), k.squeeze(2), v.squeeze(2)  # [w, t, h, d]
            s = jnp.einsum("wqhd,wkhd->whqk", q, k, preferred_element_type=jnp.float32)
            p = jax.nn.softmax(s * (d**-0.5), axis=-1).astype(v.dtype)
            o = jnp.einsum("whqk,wkhd->wqhd", p, v, preferred_element_type=jnp.float32)
            o = o.astype(jnp.bfloat16).reshape(nw, t, h * d)
            return (jnp.concatenate([o, o, o], axis=-1),)

        timeit(f"attn bhld nw={nw} t={t} h={h}", bhld, qkv)
        timeit(f"attn blhd nw={nw} t={t} h={h}", blhd, qkv)


# ------------------------------------------------------------- memattn variants
def bench_memattn():
    from us_video_medsam2_tpu.ops.posenc import compute_axial_rope

    rng = np.random.default_rng(0)
    lq, lk_sp, lp, dm = 1024, 10240, 76, 256
    q = jnp.asarray(rng.standard_normal((1, 1, lq, dm)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, 1, lk_sp + lp, dm)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, 1, lk_sp + lp, dm)), jnp.bfloat16)
    mask = jnp.asarray(rng.random((1, lk_sp + lp)) < 0.7)
    cos, sin = compute_axial_rope(dm, 32, 32)

    def xla_path(q, k, v, mask):
        from us_video_medsam2_tpu.ops.attention import sdpa
        from us_video_medsam2_tpu.ops.posenc import apply_rope

        k_rot = apply_rope(k[:, :, :lk_sp], cos, sin, repeat_to_len=lk_sp)
        kk = jnp.concatenate([k_rot, k[:, :, lk_sp:]], axis=-2)
        o = sdpa(q, kk, v, key_mask=mask, allow_flash=False)
        return o.astype(q.dtype), k, v, mask

    def xla_norepeat(q, k, v, mask):
        from us_video_medsam2_tpu.ops.attention import sdpa

        ks = k[:, :, :lk_sp].reshape(1, 1, lk_sp // 1024, 1024, dm)
        xf = ks.astype(jnp.float32).reshape(1, 1, lk_sp // 1024, 1024, dm // 2, 2)
        x0, x1 = xf[..., 0], xf[..., 1]
        o0 = x0 * cos - x1 * sin
        o1 = x0 * sin + x1 * cos
        k_rot = jnp.stack([o0, o1], -1).reshape(1, 1, lk_sp, dm).astype(k.dtype)
        kk = jnp.concatenate([k_rot, k[:, :, lk_sp:]], axis=-2)
        o = sdpa(q, kk, v, key_mask=mask, allow_flash=False)
        return o.astype(q.dtype), k, v, mask

    timeit("memattn xla tile-repeat", xla_path, q, k, v, mask)
    timeit("memattn xla broadcast-rope", xla_norepeat, q, k, v, mask)
    # shorter KV (cond slots specialized 4 -> 1)
    k7 = k[:, :, : 7 * 1024 + lp]
    v7 = v[:, :, : 7 * 1024 + lp]
    m7 = mask[:, : 7 * 1024 + lp]

    def xla_k7(q, k, v, mask):
        from us_video_medsam2_tpu.ops.attention import sdpa
        from us_video_medsam2_tpu.ops.posenc import apply_rope

        n = 7 * 1024
        k_rot = apply_rope(k[:, :, :n], cos, sin, repeat_to_len=n)
        kk = jnp.concatenate([k_rot, k[:, :, n:]], axis=-2)
        o = sdpa(q, kk, v, key_mask=mask, allow_flash=False)
        return o.astype(q.dtype), k, v, mask

    timeit("memattn xla KV=7*1024", xla_k7, q, k7, v7, m7)


if __name__ == "__main__":
    names = sys.argv[1:] or ["patch_embed", "mask_down", "attn_layout", "memattn"]
    for n in names:
        globals()[f"bench_{n}"]()
