"""Analytic FLOP counting (utils/flops.py) — the MFU numerator in bench.py.

The reference has no FLOPs accounting (its benchmark reports wall FPS only,
efficient_track_anything/benchmark.py:86-106); these tests pin the walker's
per-primitive formulas to hand counts and cross-check a loop-free program
against XLA's own cost model, then prove the property XLA gets wrong (scan
bodies multiplied by trip count) on a known loop.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from us_video_medsam2_tpu.utils.flops import fn_flops, flops_env


def test_dot_flops():
    f = fn_flops(lambda a, b: a @ b, jnp.zeros((8, 32)), jnp.zeros((32, 16)))
    assert f == 2 * 8 * 16 * 32


def test_batched_dot_general_flops():
    f = fn_flops(
        lambda a, b: jnp.einsum("bhqd,bhkd->bhqk", a, b),
        jnp.zeros((2, 3, 5, 7)),
        jnp.zeros((2, 3, 11, 7)),
    )
    assert f == 2 * (2 * 3 * 5 * 11) * 7


def test_conv_flops_incl_groups():
    conv = nn.Conv(4, (3, 3), padding="SAME")
    x = jnp.zeros((1, 8, 8, 3))
    p = conv.init(jax.random.PRNGKey(0), x)
    assert fn_flops(conv.apply, p, x) == 2 * (8 * 8 * 4) * 3 * 3 * 3
    # depthwise: per-group C_in = 1
    dw = nn.Conv(6, (3, 3), padding="SAME", feature_group_count=6)
    p = dw.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 6)))
    assert fn_flops(dw.apply, p, jnp.zeros((1, 8, 8, 6))) == 2 * (8 * 8 * 6) * 3 * 3


def test_scan_body_multiplied_by_length():
    """The whole point: XLA cost_analysis counts a scan body once; the walker
    charges it x trip count."""

    def step(c, _):
        return c @ jnp.ones((16, 16)), ()

    g = jax.jit(lambda c: jax.lax.scan(step, c, None, length=5)[0])
    assert fn_flops(g, jnp.zeros((4, 16))) == 5 * 2 * 4 * 16 * 16


def test_cond_takes_max_branch():
    def br(flag, x):
        return jax.lax.cond(
            flag, lambda x: x @ jnp.ones((32, 32)), lambda x: x * 2.0, x
        )

    assert fn_flops(br, True, jnp.zeros((4, 32))) == 2 * 4 * 32 * 32


def test_matches_xla_cost_analysis_loop_free():
    """On a loop-free program the walker and XLA's cost model must agree on
    dot+conv FLOPs (XLA adds elementwise-op flops, so compare a dots-only fn)."""

    def f(a, b, c):
        return (a @ b) @ c

    args = (jnp.zeros((16, 64)), jnp.zeros((64, 32)), jnp.zeros((32, 8)))
    ours = fn_flops(f, *args)
    cost = jax.jit(f).lower(*args).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    assert ours == float(cost["flops"]) == 2 * 16 * 32 * 64 + 2 * 16 * 8 * 32


def test_flops_env_restores():
    import os

    prior = os.environ.get("US_MEDSAM2_DISABLE_FUSED_MLP")
    with flops_env():
        assert os.environ["US_MEDSAM2_DISABLE_FUSED_MLP"] == "1"
    assert os.environ.get("US_MEDSAM2_DISABLE_FUSED_MLP") == prior


def test_propagation_scale_mini():
    """End-to-end on the MINI predictor: FLOPs grow ~linearly in frame count
    (the scan body dominates), which is exactly what cost_analysis misses."""
    from tests.conftest import require_fixture
    from tests.test_parity import MINI
    from us_video_medsam2_tpu.core.import_torch import convert_reference_state_dict
    from us_video_medsam2_tpu.inference.video_predictor import SAM2VideoPredictor
    from us_video_medsam2_tpu.models.sam2 import SAM2Model

    sd = dict(np.load(require_fixture("mini_state_dict.npz")))
    params = convert_reference_state_dict(sd, MINI)
    predictor = SAM2VideoPredictor(SAM2Model(MINI), params, fill_hole_area=0)

    def total(nf):
        video = jnp.zeros((nf, MINI.image_size, MINI.image_size, 3))
        st = predictor.init_state(video, MINI.image_size, MINI.image_size, 1)
        return fn_flops(
            predictor._propagate,
            predictor.params,
            st.images,
            st.bank,
            jnp.asarray(0),
            jnp.asarray(nf - 1),
            num_frames=nf,
            reverse=False,
            max_cond_slots=1,
        )

    f4, f8 = total(4), total(8)
    assert f4 > 0
    # 8 frames ≈ 2x the 4-frame FLOPs (prologue/epilogue are per-program)
    assert 1.7 < f8 / f4 < 2.3
