"""Pure-jnp geometry core: quaternions, SE3 (row-vector convention), NDC
cameras, epipolar geometry, camera normalization, 7-DoF alignment, metrics.

This module replaces the PyTorch3D subset the reference depends on
(SURVEY.md section 2.3 N4); everything here jits/vmaps/differentiates.
"""

from posediffusion_tpu.geometry.align import align_cameras
from posediffusion_tpu.geometry.cameras import (
    PerspectiveCameras,
    adjust_intrinsics_to_bbox_crop,
    adjust_intrinsics_to_image_scale,
    camera_center,
    cameras_to_opencv,
    ndc_to_pixel_intrinsics,
    optical_axes,
    pixel_to_ndc_intrinsics,
    unproject_ndc_points,
    world_to_view_matrix,
)
from posediffusion_tpu.geometry.epipolar import (
    essential_matrix,
    fundamental_matrix,
    get_fundamental_matrices,
    hat,
    sampson_distance,
)
from posediffusion_tpu.geometry.lines import intersect_skew_lines, point_line_distance
from posediffusion_tpu.geometry.metrics import (
    batched_all_pairs,
    calculate_auc,
    calculate_auc_np,
    camera_to_rel_deg,
    compute_are,
    rotation_angle_deg,
    translation_angle_deg,
)
from posediffusion_tpu.geometry.normalize import (
    first_camera_transform,
    normalize_cameras,
)
from posediffusion_tpu.geometry.pose_codec import (
    POSE_DIM,
    camera_to_pose_encoding,
    pose_encoding_to_camera,
)
from posediffusion_tpu.geometry.quaternions import (
    matrix_to_quaternion,
    quaternion_invert,
    quaternion_multiply,
    quaternion_normalize,
    quaternion_to_matrix,
    standardize_quaternion,
)
from posediffusion_tpu.geometry.se3 import (
    relative_se3,
    se3_compose,
    se3_inverse,
    se3_matrix,
    transform_points,
)
