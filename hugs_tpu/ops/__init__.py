from hugs_tpu.ops.rotations import (
    quat_to_matrix,
    matrix_to_quat,
    axis_angle_to_matrix,
    matrix_to_axis_angle,
    axis_angle_to_quat,
    quat_to_axis_angle,
    rotation_6d_to_matrix,
    matrix_to_rotation_6d,
    axis_angle_to_rotation_6d,
    rotation_6d_to_axis_angle,
    quat_multiply,
    quat_normalize,
)
from hugs_tpu.ops.sh import eval_sh, rgb_to_sh, sh_to_rgb
from hugs_tpu.ops.graphics import (
    projection_matrix,
    world_to_view,
    fov2focal,
    focal2fov,
    full_projection,
)
from hugs_tpu.ops.covariance import (
    build_rotation,
    build_scaling_rotation,
    covariance_from_scaling_rotation,
    strip_symmetric,
)
from hugs_tpu.ops.knn import knn, mean_sq_dist_to_knn
from hugs_tpu.ops.grid_sample import grid_sample_2d
