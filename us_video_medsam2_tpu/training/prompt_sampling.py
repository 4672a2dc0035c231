"""Interactive-prompt simulation samplers, fully on-device.

Replaces reference sam2/modeling/sam2_utils.py:156-323:
- `sample_box_points` — noised GT bounding-box corners (labels 2/3)
- `sample_random_points_from_errors` — uniform clicks from FP/FN regions via the
  masked argmax-of-noise trick (already jit-shaped in the reference)
- `sample_one_point_from_error_center` — RITM center clicks; the reference uses
  cv2.distanceTransform on host (sam2_utils.py:295-296); here the L∞→L2-ish
  distance is computed with an iterative min-pool distance transform on device
  (bounded iterations), keeping eval fully jitted.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mask_to_box(masks: jnp.ndarray) -> jnp.ndarray:
    """[B, 1, H, W] bool -> [B, 1, 4] xyxy (reference sam2/utils/misc.py:66-92).

    Empty masks produce a degenerate all-image box (matches torch argmax ties).
    """
    b, _, h, w = masks.shape
    ys = jnp.arange(h, dtype=jnp.int32)[None, None, :, None]
    xs = jnp.arange(w, dtype=jnp.int32)[None, None, None, :]
    big = jnp.int32(1 << 30)
    x_min = jnp.where(masks, xs, big).min(axis=(2, 3))
    x_max = jnp.where(masks, xs, -1).max(axis=(2, 3))
    y_min = jnp.where(masks, ys, big).min(axis=(2, 3))
    y_max = jnp.where(masks, ys, -1).max(axis=(2, 3))
    empty = ~masks.any(axis=(2, 3))
    x_min = jnp.where(empty, 0, x_min)
    y_min = jnp.where(empty, 0, y_min)
    x_max = jnp.where(empty, 0, x_max)
    y_max = jnp.where(empty, 0, y_max)
    return jnp.stack([x_min, y_min, x_max, y_max], axis=-1).astype(jnp.float32)


def sample_box_points(
    masks: jnp.ndarray,
    rng: jax.Array,
    noise: float = 0.1,
    noise_bound: float = 20.0,
):
    """[B, 1, H, W] -> coords [B, 2, 2], labels [B, 2] (reference sam2_utils.py:156-199)."""
    b, _, h, w = masks.shape
    box = mask_to_box(masks)  # [B, 1, 4]
    labels = jnp.tile(jnp.asarray([[2, 3]], jnp.int32), (b, 1))
    if noise > 0:
        bw = box[..., 2] - box[..., 0]
        bh = box[..., 3] - box[..., 1]
        max_dx = jnp.minimum(bw * noise, noise_bound)
        max_dy = jnp.minimum(bh * noise, noise_bound)
        bn = 2 * jax.random.uniform(rng, (b, 1, 4)) - 1
        bn = bn * jnp.stack([max_dx, max_dy, max_dx, max_dy], axis=-1)
        box = box + bn
        bounds = jnp.asarray([w - 1, h - 1, w - 1, h - 1], jnp.float32)
        box = jnp.clip(box, 0.0, bounds)
    return box.reshape(b, 2, 2), labels


def _argmax2d(x: jnp.ndarray):
    """(max value, first-occurrence flat argmax) over the last two [H, W] axes.

    Computed hierarchically (max over W -> argmax over H -> argmax within the
    winning row) so the reduction runs in the array's native tiled layout.
    Flattening to [H*W] first — what a literal port does — forces XLA to
    materialize a T(8,128)->T(1,128) relayout copy of the whole field; at 512²
    inside the remat'd correction scan that was ~33 ms/step (23%) of the
    round-3 train-step trace. Tie-breaking matches flat first-occurrence
    exactly: argmax picks the first row holding the max, then the first
    column within it.
    """
    w = x.shape[-1]
    rows = x.max(axis=-1)  # [..., H]
    y = jnp.argmax(rows, axis=-1)  # [...]
    row = jnp.take_along_axis(x, y[..., None, None], axis=-2)[..., 0, :]
    xcol = jnp.argmax(row, axis=-1)
    val = jnp.take_along_axis(row, xcol[..., None], axis=-1)[..., 0]
    return val, y * w + xcol


def sample_random_points_from_errors(
    gt_masks: jnp.ndarray, pred_masks: jnp.ndarray | None, rng: jax.Array
):
    """[B, 1, H, W] bool masks -> (points [B, 1, 2] float, labels [B, 1] int32).

    Port of the reference's vectorized sampler (sam2_utils.py:202-249):
    channel 0 carries FP noise, channel 1 FN noise; the argmax over both noise
    fields picks region + pixel (uniform over error pixels). The reference
    interleaves the channels and argmaxes the flat [H*W*2] array; here each
    channel keeps its native [B, 1, H, W] layout (see _argmax2d) and the
    channel choice replays the flat tie-break order (channel is the minor
    interleave axis, so equal maxima resolve to channel 0 / earlier pixel).
    """
    if pred_masks is None:
        pred_masks = jnp.zeros_like(gt_masks)
    b, _, h, w = gt_masks.shape
    fp = ~gt_masks & pred_masks
    fn = gt_masks & ~pred_masks
    all_correct = jnp.all(gt_masks == pred_masks, axis=(2, 3), keepdims=True)

    noise = jax.random.uniform(rng, (2, b, 1, h, w))
    noise0 = noise[0] * (fp | (all_correct & ~gt_masks))
    noise1 = noise[1] * fn
    max0, pix0 = _argmax2d(noise0)  # [B, 1] each
    max1, pix1 = _argmax2d(noise1)
    take1 = (max1 > max0) | ((max1 == max0) & (pix1 < pix0))
    labels = take1.astype(jnp.int32)
    pix = jnp.where(take1, pix1, pix0)
    pts_x = (pix % w).astype(jnp.float32)
    pts_y = (pix // w).astype(jnp.float32)
    points = jnp.stack([pts_x, pts_y], axis=2)
    return points, labels


def _distance_transform(mask: jnp.ndarray, num_iters: int) -> jnp.ndarray:
    """Approximate L2 distance-to-zero for [B, H, W] bool via chamfer sweeps.

    Iterative 3x3 min-pool with (1, sqrt2) increments — the chamfer-1-√2
    approximation of cv2.distanceTransform(DIST_L2, 0). num_iters bounds the
    max representable distance; clicks go to the max anyway.
    """
    b, h, w = mask.shape
    big = jnp.float32(1e9)
    d = jnp.where(mask, big, 0.0)
    straight = jnp.asarray([1.0, jnp.sqrt(2.0)], jnp.float32)

    def body(_, d):
        p = jnp.pad(d, ((0, 0), (1, 1), (1, 1)), constant_values=big)
        m = d
        for dy in (0, 1, 2):
            for dx in (0, 1, 2):
                if dy == 1 and dx == 1:
                    continue
                step = straight[0] if (dy == 1 or dx == 1) else straight[1]
                m = jnp.minimum(m, p[:, dy : dy + h, dx : dx + w] + step)
        return jnp.where(mask, m, 0.0)

    return jax.lax.fori_loop(0, num_iters, body, d)


def sample_one_point_from_error_center(
    gt_masks: jnp.ndarray,
    pred_masks: jnp.ndarray | None,
    rng: jax.Array = None,
    num_dt_iters: int = 64,
):
    """RITM-style center click (reference sam2_utils.py:252-314), on device.

    Picks the point farthest from the boundary of the FN or FP region (with the
    1-px padding the reference applies before the distance transform).
    """
    if pred_masks is None:
        pred_masks = jnp.zeros_like(gt_masks)
    b, _, h, w = gt_masks.shape
    fp = (~gt_masks & pred_masks)[:, 0]
    fn = (gt_masks & ~pred_masks)[:, 0]

    # 1-px zero border == reference's np.pad before cv2.distanceTransform
    border = jnp.zeros((b, h, w), bool).at[:, 1:-1, 1:-1].set(True)
    fn_max, fn_arg = _argmax2d(_distance_transform(fn & border, num_dt_iters))
    fp_max, fp_arg = _argmax2d(_distance_transform(fp & border, num_dt_iters))
    is_positive = fn_max > fp_max
    pt_idx = jnp.where(is_positive, fn_arg, fp_arg)
    pts = jnp.stack(
        [(pt_idx % w).astype(jnp.float32), (pt_idx // w).astype(jnp.float32)], axis=-1
    )[:, None]
    labels = is_positive.astype(jnp.int32)[:, None]
    return pts, labels


def get_next_point(gt_masks, pred_masks, method: str, rng: jax.Array):
    if method == "uniform":
        return sample_random_points_from_errors(gt_masks, pred_masks, rng)
    if method == "center":
        return sample_one_point_from_error_center(gt_masks, pred_masks, rng)
    raise ValueError(f"unknown sampling method {method}")
