from dvmvs_tpu.ops.geometry import (
    depth_to_3d,
    inverse_pose,
    make_warp_grid,
    normalize_pixel_coordinates,
    pose_distance,
    pose_distance_np,
    project_points,
    transform_points,
)
from dvmvs_tpu.ops.sampling import (
    grid_sample,
    resize_bilinear_align_corners,
    resize_nearest,
)
from dvmvs_tpu.ops.cost_volume import (
    cost_volume_fused,
    plane_sweep_cost_volume,
    plane_sweep_cost_volume_banded,
    plane_sweep_cost_volume_train,
)
from dvmvs_tpu.ops.warp import (
    splat_depth_max,
    splat_depth_max_strided,
    splat_depth_soft,
    warp_frame_depth,
)
