"""Configuration for the disconet_tpu framework.

Single source of truth mirroring the reference's ``coperception/configs/Config.py``
and ``ConfigGlobal.py`` (SURVEY.md C1, tier-[B]): voxel size 0.25x0.25x0.4 m, area
extents x,y in [-32, 32] m and z in [-3, 2] m -> a 256x256x13 binary BEV occupancy
grid, binary (background/vehicle) classification, 6 rotated anchors per cell with a
(x, y, w, h, sin, cos) box code.

Unlike the reference (two near-duplicate classes, one for the student and one for
the "global"/teacher holistic view), the rebuild uses one frozen dataclass that is
fully parametric in the grid geometry so that tiny configs (for CPU-mesh sharding
tests and the multi-chip dry-run) are first-class rather than hacks.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class Config:
    """Detection/segmentation configuration.

    Numeric defaults follow the reference Config (SURVEY.md C1):
    ``voxel_size`` 0.25x0.25x0.4 m, ``area_extents`` x,y in [-32,32] z in [-3,2],
    binary vehicle class, 6 anchors/cell, box code (x,y,w,h,sin,cos).
    """

    split: str = "train"
    binary: bool = True
    only_det: bool = True

    # Geometry — reference Config voxel/extent constants.
    voxel_size: Tuple[float, float, float] = (0.25, 0.25, 0.4)
    area_extents: Tuple[Tuple[float, float], ...] = ((-32.0, 32.0), (-32.0, 32.0), (-3.0, 2.0))

    # Agents: 5 vehicles + optionally 1 RSU (agent 0).  README.md:63,75,96.
    max_agents: int = 6

    # Anchors: 6 rotated anchors per BEV cell, (w, l, theta).  Tier-[B]
    # reconstruction of obj_util.init_anchors_no_check defaults; isolated here as
    # data so a later parity fix is a constant change, not a code change.
    anchor_sizes: Tuple[Tuple[float, float, float], ...] = (
        (2.0, 4.0, 0.0),
        (2.0, 4.0, math.pi / 2.0),
        (1.0, 1.0, 0.0),
        (1.0, 2.0, 0.0),
        (1.0, 2.0, math.pi / 2.0),
        (0.8, 0.8, 0.0),
    )

    # Box code length: (dx, dy, dw, dh, sin, cos).
    box_code_size: int = 6
    # Classes: binary => {background, vehicle}.
    num_classes: int = 2

    # Training targets / thresholds (FaF/MotionNet lineage, tier-[B]).
    pos_iou_threshold: float = 0.4
    neg_iou_threshold: float = 0.2

    # Max positive anchors shipped per agent-frame in the sparse target
    # encoding (host->device transfer optimization; ~60 positives/gt box).
    max_pos_anchors: int = 2048

    # Eval / NMS.
    score_threshold: float = 0.3
    nms_iou_threshold: float = 0.01
    nms_top_k: int = 256
    map_iou_thresholds: Tuple[float, ...] = (0.5, 0.7)

    # Backbone widths (SURVEY.md C11: 32->64->128->256->512, decode back to 128-ch
    # stride-1 features feeding the heads).
    backbone_channels: Tuple[int, ...] = (32, 64, 128, 256, 512)
    head_channels: int = 128

    # Fusion layer index (``--layer``, default 3 -> 32x32x256 for the 256^2 grid).
    fusion_layer: int = 3

    # Loss weights.
    cls_weight: float = 1.0
    reg_weight: float = 2.0
    kd_weight: float = 100000.0
    focal_gamma: float = 2.0
    smooth_l1_sigma: float = 3.0

    # Compute dtype for the conv stack (bf16 matmuls, fp32 accum/params).
    compute_dtype: str = "bfloat16"

    # Run backbone stage 0 + decoder stage 0 in 2x2 block space (exact
    # space-to-depth conv rewrite, ops/blockspace.py): the narrow 32-channel
    # convs at full resolution otherwise cap at 1/4 MXU lane utilization.
    # Pure runtime layout choice — params/checkpoints are identical either way.
    # Measured on v5e at the reference geometry: raises achieved TFLOP/s
    # (40 -> 62) but the 4x structured-zero FLOPs of the 3x3 block kernels plus
    # the input space-to-depth cost MORE wall time than the lane win saves
    # (196 -> 180 scenes/s e2e), so the default stays natural layout. Flip on
    # for geometries where the narrow stages dominate harder.
    block_space: bool = False

    # Run decoder stage 0 in block-OUT form (ops/blockspace.py): each narrow
    # conv becomes a stride-2 4x4 conv emitting 2x2 pixel blocks as channels
    # (16/9 FLOPs, 4x output lanes), inputs/outputs stay natural NHWC. Exact
    # rewrite; params/checkpoints identical. Measured on v5e at the reference
    # geometry: dec0+head_conv chain 24.6 -> 19.1 ms (batch 16), unlike
    # block_space whose input relayout + 4x structured-zero FLOPs lost wall
    # time. Mutually exclusive with block_space.
    block_out: bool = True

    # Apply the same block-OUT rewrite to decoder stage 1 (64 channels at
    # 128^2 — half the MXU's 128 lanes in natural layout). Exact rewrite,
    # checkpoints unchanged; requires block_out (it shares the dispatch).
    # Measured NEGATIVE at the reference geometry on v5e (211.4 -> ~209
    # scenes/s e2e): at 64 output channels the natural conv already fills
    # half the lanes and XLA batches the two half-tiles well, so the 16/9
    # FLOPs of the 4x4 rewrite cost more than the lane win saves. Kept as a
    # tested mode for narrower geometries; default off.
    block_out_dec1: bool = False

    # Storage dtype of the packed head output ("head_raw"). The head matmul
    # always accumulates fp32; this only sets the dtype of the materialized
    # (B*A, H, W, 48) tensor the predict path re-reads for candidate
    # selection — bf16 halves that HBM round-trip (~1.2 GB -> 0.6 GB at the
    # reference geometry, batch 16). Training never reads head_raw (the fp32
    # cls/reg views are separate graph outputs and XLA dead-code-eliminates
    # whichever the jitted step doesn't use), so losses/gradients are
    # unaffected. Score/box effect: logits round to 8-bit mantissa before the
    # sigmoid/decode (~0.4% relative), far below detection-threshold noise.
    head_raw_dtype: str = "bfloat16"

    # Storage dtype of the head_conv output ("head_in") — the largest
    # activation in the network (128ch at full resolution, ~3.2 GB fp32
    # write+read per batch-16 step). When compute_dtype is "bfloat16" (the
    # TPU default) the det heads matmul casts its input to bf16 anyway, so
    # the rounding just moves before the store and the det outputs are
    # BIT-identical (tested for that configuration; under f32 compute the
    # store rounding is NOT absorbed and detections change); only
    # consumers that read head_in at full precision see a change (KD feature
    # MSE and the seg head observe bf16-rounded features). Measured NEUTRAL
    # e2e on v5e at the reference geometry (212.06 vs 212.04 scenes/s,
    # batch 16) — the decode/head boundary is compute- not store-bound, like
    # the earlier ConvBNRelu bf16-output experiment. Default stays fp32 so
    # KD/seg numerics are untouched; flip on for HBM-tight geometries.
    head_in_dtype: str = "float32"

    # INFERENCE dtype of the all-pairs pose warp at the fusion layer
    # (models/base.py). "bfloat16": the dense one-hot tap matrix (151 MB/scene
    # fp32 at the 32x32 fusion grid) and the warped maps halve their HBM
    # footprint and the contraction runs the bf16 MXU path with f32
    # accumulation — 215.5 -> 219.3 scenes/s e2e on v5e, and mAP-IDENTICAL
    # on the same checkpoint (0.4134 vs 0.4133 mAP@0.7, synthetic 64-grid
    # benchmark). Training steps (train=True) always warp f32 regardless:
    # TRAINING through bf16 warps measured −0.11 mAP@0.7 (0.3085 vs 0.4133,
    # same protocol) — quantized-warp gradients hurt localization convergence
    # even though the forward difference is negligible. "float32" disables
    # the inference cast too (the exact / torch-grid_sample oracle mode).
    warp_dtype: str = "bfloat16"

    # Candidate selection for the predict/NMS path when the packed head
    # tensor is available (binary class). True: select straight from raw
    # logits via the lane-roll cell max (ops/nms.py rotated_nms_decode_packed
    # + _cell_max_logit_diff) — ONE fused full-register-width pass over the
    # packed tensor, no (H, W, NA)-minor score tensor is ever materialized
    # (minor-dim-6 tensors run at 6/128 TPU lane utilization, which is what
    # made both the dense-score path and the first sliced-lane packed variant
    # slow). False: materialize sigmoid scores once and run the two-level
    # spatial top-k on them (the pre-lane-roll production path). See
    # tools/bench_cand.py; selection semantics note in
    # rotated_nms_decode_packed's docstring (logit-domain ranking breaks
    # sigmoid-saturation ties differently; unit-tested equal keep sets).
    packed_nms: bool = False

    # Compute the det losses straight from the fp32 PACKED head tensor
    # (ops/losses.py packed_det_losses: dense background pass + sparse
    # correction at the listed positive sites) instead of the logical
    # (B,A,H,W,NA,·) cls/reg views. The views' trailing dims (6,2)/(6,6)
    # tile to (8,128) on TPU — up to 85x physical HBM inflation — which made
    # heads+loss 49% of the measured train step at ~46 GB of traffic
    # (docs/performance.md, train-step roofline). Numerically equal (values
    # and gradients, tests/test_packed_loss.py); False restores the view
    # path (the oracle, and the only path for dense reference targets).
    packed_loss: bool = True

    # Rematerialize intra-stage activations in the training backward pass
    # (training/det_module.py): stage-boundary tensors are tagged with
    # jax.ad_checkpoint.checkpoint_name ("stage_boundary", backbone.py /
    # models/base.py) and the train step's forward runs under jax.checkpoint
    # with save_only_these_names, so the backward recomputes each stage's
    # conv/BN intermediates from its input instead of round-tripping them
    # through HBM as saved fp32 residuals. Trades ~1x extra forward FLOPs in
    # the backward for the residual traffic — a win iff the train step is
    # bandwidth-bound (measure with tools/bench_train_stages.py). Exact same
    # math re-executed; gradients identical up to reissued-op rounding.
    train_remat: bool = False

    # Segmentation (SURVEY.md C3): ~8 BEV semantic classes.
    num_seg_classes: int = 8

    # Seg backbone (SURVEY.md C19): "unet" = the reference seg zoo's classic
    # UNet topology (models/unet.py: DoubleConv + maxpool downs 64..512,
    # upsample-concat-DoubleConv ups); "stpn" = reuse the det STPN pyramid
    # with a 1x1 SegHead. A/B'd on the synthetic benchmark (BASELINE.md);
    # det models ignore this.
    seg_backbone: str = "unet"
    unet_channels: Tuple[int, ...] = (64, 128, 256, 512, 512)

    # ---- derived geometry ----
    @property
    def grid_size(self) -> Tuple[int, int, int]:
        """BEV grid cells per axis: ceil(extent / voxel)."""
        dims = []
        for (lo, hi), v in zip(self.area_extents, self.voxel_size):
            dims.append(int(math.ceil((hi - lo) / v - 1e-9)))
        return tuple(dims)  # (256, 256, 13) at defaults

    @property
    def bev_shape(self) -> Tuple[int, int, int]:
        """(H, W, Z) occupancy input shape, NHWC-style with Z as channels."""
        gx, gy, gz = self.grid_size
        return (gx, gy, gz)

    @property
    def num_anchors(self) -> int:
        return len(self.anchor_sizes)

    @property
    def map_dims(self) -> Tuple[int, int]:
        gx, gy, _ = self.grid_size
        return (gx, gy)

    @property
    def fusion_stride(self) -> int:
        """Spatial stride at the fusion layer (layer k fuses at stride 2^k)."""
        return 2 ** self.fusion_layer

    @property
    def fusion_channels(self) -> int:
        return self.backbone_channels[min(self.fusion_layer, len(self.backbone_channels) - 1)]

    def anchor_centers(self) -> np.ndarray:
        """(H, W, 2) metric xy centers of each BEV cell."""
        (x_lo, _), (y_lo, _), _ = self.area_extents
        vx, vy, _ = self.voxel_size
        gx, gy, _ = self.grid_size
        xs = x_lo + (np.arange(gx, dtype=np.float32) + 0.5) * vx
        ys = y_lo + (np.arange(gy, dtype=np.float32) + 0.5) * vy
        cx, cy = np.meshgrid(xs, ys, indexing="ij")
        return np.stack([cx, cy], axis=-1)


def default_fusion_layer(grid: int) -> int:
    """Resolution-aware default for ``--layer`` (the fusion stage index).

    The reference hard-codes ``--layer 3`` — at its 256^2 grid that fuses
    32x32 feature maps (1 m/cell after the 0.25 m voxels). Keeping the *index*
    fixed while shrinking the grid silently coarsens the *physical* fusion
    resolution: at 64-grid, layer 3 is 8x8 = 2 m/cell, too coarse for the
    pose warp + per-pixel edge weights to transport a neighbor-only vehicle
    (~4.5 m long). Measured on the occluded benchmark (docs/benchmarking.md):
    layer-3 disco 0.219 mAP@0.7 loses to the no-collaboration lowerbound
    0.235, while layer-2 (16x16) disco scores 0.300 and disco+KD 0.340.

    Rule: keep the reference's layer 3 whenever the fusion map stays >=16x16,
    otherwise drop the layer until it is (floor 16x16) — i.e. preserve fusion
    resolution, not layer index, across grid sizes.

    Measured at the reference geometry (round 4, results/occluded256_pair.json):
    at 256-grid, layer 3 (32x32 fusion) disco beats lowerbound by +0.12
    mAP@0.7 beyond noise on the occluded benchmark — the "layer 3 is already
    resolution-sufficient at 256" claim is a measurement, not a prediction.
    """
    return max(0, min(3, int(math.log2(max(16, grid))) - 4))


@dataclasses.dataclass(frozen=True)
class ConfigGlobal(Config):
    """Teacher / holistic-view variant (reference ConfigGlobal, SURVEY.md C1).

    In the reference the teacher consumes the merged ("holistic") point cloud of
    all agents voxelized into the same grid; geometry is identical, so this exists
    mainly to mirror the reference API surface.
    """

    split: str = "train"


def tiny_config(grid: int = 64, **overrides) -> Config:
    """A small config for tests and the multi-chip CPU dry-run.

    Keeps the full architecture (all 5 backbone stages, fusion at ``--layer 3``)
    but shrinks the grid so compile times stay in milliseconds.
    """
    half = grid * 0.25 / 2.0
    defaults = dict(
        area_extents=((-half, half), (-half, half), (-3.0, 2.0)),
        nms_top_k=64,
    )
    defaults.update(overrides)
    return Config(**defaults)
