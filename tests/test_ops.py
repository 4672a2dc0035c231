"""Op-level numerical parity vs torch (the oracle the reference is built on)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from us_video_medsam2_tpu.ops.posenc import (  # noqa: E402
    apply_rope,
    compute_axial_rope,
    sine_pe_1d,
    sine_pos_embed_2d,
)
from us_video_medsam2_tpu.ops.resize import resize2d, upsample_nearest_2x  # noqa: E402
from us_video_medsam2_tpu.ops.window import window_partition, window_unpartition  # noqa: E402


def _t2j_nhwc(x):
    return jnp.asarray(x.permute(0, 2, 3, 1).numpy())


def _j2t_nchw(x):
    return torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)


@pytest.mark.parametrize(
    "in_hw,out_hw,mode,antialias",
    [
        ((7, 7), (128, 128), "cubic", False),  # hiera pos embed
        ((64, 64), (256, 256), "linear", False),  # mask logits upsample
        ((32, 32), (128, 128), "linear", False),
        ((256, 256), (64, 64), "linear", True),  # mask-as-output downsample
        ((512, 512), (128, 128), "linear", True),  # sam mask prompt downsample
        ((33, 47), (16, 24), "linear", True),
        ((16, 16), (32, 32), "nearest", False),  # fpn top-down
    ],
)
def test_resize_matches_torch(in_hw, out_hw, mode, antialias):
    torch.manual_seed(0)
    x = torch.randn(2, 3, *in_hw)
    tmode = {"linear": "bilinear", "cubic": "bicubic", "nearest": "nearest"}[mode]
    kwargs = dict(size=out_hw, mode=tmode)
    if mode != "nearest":
        kwargs["align_corners"] = False
        kwargs["antialias"] = antialias
    ref = F.interpolate(x, **kwargs)
    got = resize2d(_t2j_nhwc(x), out_hw, mode=mode, antialias=antialias)
    np.testing.assert_allclose(
        np.asarray(_j2t_nchw(got)), ref.numpy(), rtol=1e-4, atol=1e-5
    )


def test_upsample_nearest_2x():
    torch.manual_seed(0)
    x = torch.randn(1, 4, 8, 8)
    ref = F.interpolate(x, scale_factor=2.0, mode="nearest")
    got = upsample_nearest_2x(_t2j_nhwc(x))
    np.testing.assert_allclose(np.asarray(_j2t_nchw(got)), ref.numpy(), atol=0)


def test_sine_pos_embed_2d_matches_reference_formula():
    """Check against a literal re-evaluation of reference position_encoding.py:79-112."""
    h, w, channels, temp = 16, 16, 64, 10000
    half = channels // 2
    y_embed = torch.arange(1, h + 1, dtype=torch.float32).view(1, -1, 1).repeat(1, 1, w)
    x_embed = torch.arange(1, w + 1, dtype=torch.float32).view(1, 1, -1).repeat(1, h, 1)
    eps, scale = 1e-6, 2 * np.pi
    y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale
    dim_t = torch.arange(half, dtype=torch.float32)
    dim_t = temp ** (2 * (dim_t // 2) / half)
    pos_x = x_embed[:, :, :, None] / dim_t
    pos_y = y_embed[:, :, :, None] / dim_t
    pos_x = torch.stack((pos_x[..., 0::2].sin(), pos_x[..., 1::2].cos()), dim=4).flatten(3)
    pos_y = torch.stack((pos_y[..., 0::2].sin(), pos_y[..., 1::2].cos()), dim=4).flatten(3)
    ref = torch.cat((pos_y, pos_x), dim=3)[0]  # [H, W, C]
    got = sine_pos_embed_2d(h, w, channels, temp)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-5, atol=1e-6)


def test_sine_pe_1d_matches_reference():
    dim = 64
    pos = torch.tensor([0.0, 0.25, 0.5, 1.0, -0.5])
    pe_dim = dim // 2
    dim_t = torch.arange(pe_dim, dtype=torch.float32)
    dim_t = 10000 ** (2 * (dim_t // 2) / pe_dim)
    pe = pos.unsqueeze(-1) / dim_t
    ref = torch.cat([pe.sin(), pe.cos()], dim=-1)
    got = sine_pe_1d(jnp.asarray(pos.numpy()), dim)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-5, atol=1e-6)


def _torch_axial_rope(dim, end_x, end_y, theta=10000.0):
    freqs_x = 1.0 / (theta ** (torch.arange(0, dim, 4)[: dim // 4].float() / dim))
    freqs_y = 1.0 / (theta ** (torch.arange(0, dim, 4)[: dim // 4].float() / dim))
    t = torch.arange(end_x * end_y, dtype=torch.float32)
    t_x, t_y = (t % end_x).float(), torch.div(t, end_x, rounding_mode="floor").float()
    fx = torch.outer(t_x, freqs_x)
    fy = torch.outer(t_y, freqs_y)
    return torch.polar(torch.ones_like(fx), fx), torch.polar(torch.ones_like(fy), fy)


def test_rope_matches_reference():
    dim, ex, ey = 32, 8, 8
    cx, cy = _torch_axial_rope(dim, ex, ey)
    freqs_cis = torch.cat([cx, cy], dim=-1)  # [L, dim//2] complex

    torch.manual_seed(0)
    B, H, L = 2, 2, ex * ey
    q = torch.randn(B, H, L, dim)
    k = torch.randn(B, H, 3 * L, dim)  # repeated keys (3 memory slots)

    # reference apply_rotary_enc with repeat_freqs_k
    q_ = torch.view_as_complex(q.reshape(B, H, L, dim // 2, 2))
    fc = freqs_cis.view(1, 1, L, dim // 2)
    q_ref = torch.view_as_real(q_ * fc).flatten(3)
    k_ = torch.view_as_complex(k.reshape(B, H, 3 * L, dim // 2, 2))
    fc3 = fc.unsqueeze(2).expand(-1, -1, 3, -1, -1).flatten(2, 3)
    k_ref = torch.view_as_real(k_ * fc3).flatten(3)

    cos, sin = compute_axial_rope(dim, ex, ey)
    q_got = apply_rope(jnp.asarray(q.numpy()), cos, sin)
    k_got = apply_rope(jnp.asarray(k.numpy()), cos, sin, repeat_to_len=3 * L)
    np.testing.assert_allclose(np.asarray(q_got), q_ref.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(k_got), k_ref.numpy(), rtol=1e-5, atol=1e-5)


def test_window_partition_roundtrip():
    torch.manual_seed(0)
    x = jnp.asarray(torch.randn(2, 18, 22, 8).numpy())
    wins, pad_hw = window_partition(x, 7)
    assert wins.shape[1:] == (7, 7, 8)
    back = window_unpartition(wins, 7, pad_hw, (18, 22))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=0)


@pytest.mark.parametrize(
    "h,cin,co,k,s,pad",
    [
        (64, 1, 4, 3, 2, 1),    # MaskDownSampler first layer shape family
        (32, 4, 16, 3, 2, 1),
        (16, 16, 64, 3, 2, 1),
        (64, 3, 8, 7, 4, 3),    # patch-embed family
        (32, 8, 16, 2, 2, 0),   # prompt-encoder mask downscale (pure fold)
        (32, 1, 4, 4, 4, 0),    # sam2 mask_downsample (pure fold)
    ],
)
def test_s2d_conv_matches_lax_conv(h, cin, co, k, s, pad):
    """ops/conv_matmul.py must be numerically identical to the XLA conv it
    replaces inside Conv2d (torch Conv2d semantics)."""
    import jax

    from us_video_medsam2_tpu.ops.conv_matmul import s2d_conv, s2d_conv_applicable

    assert s2d_conv_applicable(k, k, s, pad, h, h, 1)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, h, h, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, cin, co)) / np.sqrt(k * k * cin))
    b = jnp.asarray(rng.standard_normal((co,)) * 0.1)
    got = s2d_conv(x, w, b, s, pad)
    want = (
        jax.lax.conv_general_dilated(
            x, w, (s, s), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        + b
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("h,c,k", [(16, 32, 7), (12, 8, 3)])
def test_depthwise_shifted_matches_lax_conv(h, c, k):
    import jax

    from us_video_medsam2_tpu.ops.conv_matmul import depthwise_conv_shifted

    rng = np.random.default_rng(1)
    pad = k // 2
    x = jnp.asarray(rng.standard_normal((2, h, h, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, 1, c)) / k)
    b = jnp.asarray(rng.standard_normal((c,)) * 0.1)
    got = depthwise_conv_shifted(x, w, b, pad)
    want = (
        jax.lax.conv_general_dilated(
            x, w, (1, 1), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )
        + b
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_rope_halfsplit_equivalent_to_interleaved():
    """halfsplit(P x) == P(interleaved(x)) for the importer's channel
    permutation P, and the q.k inner product is preserved."""
    from us_video_medsam2_tpu.ops.posenc import (
        apply_rope,
        apply_rope_halfsplit,
        compute_axial_rope,
        rope_halfsplit_perm,
    )

    rng = np.random.default_rng(3)
    heads, dh, hw = 2, 32, 4
    cos, sin = compute_axial_rope(dh, hw, hw, 10000.0)
    x = jnp.asarray(rng.standard_normal((1, heads, hw * hw, dh)), jnp.float32)
    perm = rope_halfsplit_perm(heads * dh, heads)
    # per-head slice of the flat permutation
    ph = perm[:dh]
    got = apply_rope_halfsplit(x[..., :] [..., ph - 0], cos, sin)  # permute channels
    want = apply_rope(x, cos, sin)[..., ph]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)
    # inner products preserved between permuted-rotated q/k pairs
    q = jnp.asarray(rng.standard_normal((1, 1, hw * hw, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 1, hw * hw, dh)), jnp.float32)
    p0 = rope_halfsplit_perm(dh, 1)
    qh = apply_rope_halfsplit(q[..., p0], cos, sin)
    kh = apply_rope_halfsplit(k[..., p0], cos, sin)
    qi = apply_rope(q, cos, sin)
    ki = apply_rope(k, cos, sin)
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("bhqd,bhkd->bhqk", qh, kh)),
        np.asarray(jnp.einsum("bhqd,bhkd->bhqk", qi, ki)),
        rtol=1e-5, atol=1e-5,
    )


def test_folded_pyramid_matches_direct_convs():
    """ops/folded_pyramid.py must reproduce the direct k3/s2/p1 conv chain
    (the memory-encoder parity fixture also covers this through the module)."""
    import jax

    from us_video_medsam2_tpu.ops.folded_pyramid import folded_conv_layer
    from us_video_medsam2_tpu.ops.window import space_to_depth

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 1)), jnp.float32)
    xf = space_to_depth(x, 16)
    g_in, cin = 16, 1
    xd = x
    for layer in range(4):
        cout = cin * 4
        w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) / np.sqrt(9 * cin))
        b = jnp.asarray(rng.standard_normal((cout,)) * 0.1)
        xf = folded_conv_layer(xf, w, b, g_in, jnp.float32)
        xd = (
            jax.lax.conv_general_dilated(
                xd, w, (2, 2), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            + b
        )
        g_in, cin = g_in // 2, cout
    # final folded layout == true layout (g_out == 1 on the last layer)
    np.testing.assert_allclose(np.asarray(xf), np.asarray(xd), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize(
    "hw,ws,dim,heads,q_pool",
    [
        ((16, 16), 7, 96, 1, False),  # padded windows (stage-4 geometry)
        ((128, 128), 8, 192, 2, True),  # stage-1/2 transition (q-pooled)
        ((64, 64), 4, 96, 2, False),  # 16-token windows: G=8 packing
        ((32, 32), 14, 384, 4, False),  # stage-3 geometry, heavy padding
        ((32, 32), 14, 768, 8, True),  # stage-4 transition
    ],
)
def test_window_attention_matches_straightforward_reference(hw, ws, dim, heads, q_pool):
    """MultiScaleAttention's head-major packed windowed attention
    (models/hiera.py) matches a straightforward partition -> per-window SDPA
    -> unpartition computation (reference hieradet.py:39-117 semantics, incl.
    zero-padded tokens carrying the qkv projection bias)."""
    import jax

    from us_video_medsam2_tpu.models.hiera import MultiScaleAttention, _max_pool_2x
    from us_video_medsam2_tpu.ops.window import window_partition, window_unpartition

    h, w = hw
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, h, w, dim), jnp.float32)
    m = MultiScaleAttention(dim_out=dim, num_heads=heads, q_pool=q_pool)
    params = m.init(rng, x, window_size=ws)
    out = m.apply(params, x, window_size=ws)

    # straightforward reference path on the same params
    kq = np.asarray(params["params"]["qkv"]["kernel"])
    bq = np.asarray(params["params"]["qkv"]["bias"])
    kp = np.asarray(params["params"]["proj"]["kernel"])
    bp = np.asarray(params["params"]["proj"]["bias"])
    hd = dim // heads
    xw, pad_hw = window_partition(x, ws)  # [B*nW, ws, ws, dim], zero pads
    bwin = xw.shape[0]
    qkv = jnp.asarray(np.asarray(xw) @ kq + bq)
    qkv = qkv.reshape(bwin, ws * ws, 3, heads, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    if q_pool:
        q = _max_pool_2x(q.reshape(bwin, ws, ws, dim))
        hq = q.shape[1]
        q = q.reshape(bwin, hq * hq, heads, hd)
    q, k, v = (a.transpose(0, 2, 1, 3) for a in (q, k, v))
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * hd**-0.5
    p = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, v).transpose(0, 2, 1, 3)
    wso = ws // 2 if q_pool else ws
    o = o.reshape(bwin, wso, wso, dim)
    if q_pool:
        pad_hw = tuple(d // 2 for d in pad_hw)
    ref = window_unpartition(
        o, wso, pad_hw, (h // 2, w // 2) if q_pool else (h, w)
    )
    ref = np.asarray(ref) @ kp + bp
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)
