from us_video_medsam2_tpu.ops.resize import (
    resize2d,
    upsample_nearest_2x,
)
from us_video_medsam2_tpu.ops.posenc import (
    sine_pos_embed_2d,
    sine_pe_1d,
    compute_axial_rope,
    apply_rope,
)
from us_video_medsam2_tpu.ops.window import window_partition, window_unpartition
from us_video_medsam2_tpu.ops.attention import sdpa
