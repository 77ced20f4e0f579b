"""Geometry / kernel ops for disconet_tpu.

Numpy "oracle" implementations live next to their jax/Pallas counterparts and are
used as parity references in tests (SURVEY.md §5.1 rebuild test strategy).
"""

from disconet_tpu.ops.boxes import (  # noqa: F401
    make_anchors,
    encode_boxes,
    encode_boxes_np,
    decode_boxes,
    box_corners,
    box_corners_np,
)
from disconet_tpu.ops.voxelize import (  # noqa: F401
    voxelize_occupy_np,
    voxelize_occupy_jax,
    voxelize_occupy,
)
from disconet_tpu.ops.warp import (  # noqa: F401
    affine_grid,
    grid_sample,
    pose_to_affine,
    warp_features,
)
from disconet_tpu.ops.rotated_iou import (  # noqa: F401
    rotated_iou_np,
    rotated_iou_matrix,
    rotated_iou_pairs,
    rotated_iou_pairs_np,
    rotated_iou_matrix_np,
)
from disconet_tpu.ops.nms import (  # noqa: F401
    foreground_scores,
    rotated_nms,
    rotated_nms_decode,
)
from disconet_tpu.ops.losses import (  # noqa: F401
    softmax_focal_loss,
    weighted_smooth_l1,
    kd_feature_loss,
)
from disconet_tpu.ops.late_fusion import late_fusion, transform_boxes, nms_np  # noqa: F401
