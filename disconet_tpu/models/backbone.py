"""STPN backbone + detection heads (SURVEY.md C11, reference
coperception/models/det/backbone/Backbone.py, MotionNet lineage README.md:104).

TPU-first choices (vs the reference's NCHW torch conv stack):
  * NHWC layout throughout — the native TPU conv layout;
  * bf16 conv compute with fp32 params and fp32 BatchNorm — MXU-friendly,
    numerically safe (SURVEY.md C11 rebuild note);
  * nearest-neighbor upsample (pure reshape/broadcast, fuses into the following
    conv) instead of transposed convs;
  * encoder exposed stage-by-stage so intermediate-fusion models can fuse at
    ``--layer k`` without re-running anything (SURVEY.md C12).

Encoder: stages 32-64-128-256-512, each = two 3x3 ConvBNRelu, first conv of
stages 1..4 has stride 2: 256^2 -> 16^2. Decoder: skip-concat pyramid back to
stride 1, ending in a ``head_channels`` (128) map feeding 1x1-conv cls/reg heads
(anchors x classes, anchors x box-code). Decoder stage outputs are returned for
knowledge distillation (SURVEY.md C13/C20).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from disconet_tpu.config import Config


def _dtype(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


class MaskedBatchNorm(nn.Module):
    """BatchNorm whose batch statistics exclude masked-out leading rows.

    The fusion scorers run on the (B*Ar*As)-folded pair batch, which includes
    padded (absent-agent) pairs; the reference's python loop only ever
    evaluates real pairs, so unmasked statistics would drift from reference
    training semantics (its outputs for masked rows are garbage — callers mask
    them downstream). Parameter/variable names match flax ``nn.BatchNorm``
    ('scale'/'bias', batch_stats 'mean'/'var') so checkpoint trees are
    interchangeable with the unmasked module.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, mask=None, use_running_average: bool = False):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((C,), jnp.float32))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            red = tuple(range(x.ndim - 1))
            if mask is None:
                mean = jnp.mean(x, axis=red)
                var = jnp.mean(jnp.square(x), axis=red) - jnp.square(mean)
            else:
                m = mask.astype(jnp.float32).reshape(
                    (x.shape[0],) + (1,) * (x.ndim - 1)
                )
                cnt = jnp.sum(m) * float(np.prod(x.shape[1:-1]))
                mean = jnp.sum(x * m, axis=red) / cnt
                var = jnp.sum(jnp.square(x) * m, axis=red) / cnt - jnp.square(mean)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1.0 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1.0 - self.momentum) * var
        return scale * (x - mean) * jax.lax.rsqrt(var + self.epsilon) + bias


class ConvBNRelu(nn.Module):
    """3x3 (or kxk) conv -> BatchNorm -> ReLU, bf16 matmul / fp32 statistics.

    ``mode`` selects the layout (ops/blockspace.py, exact rewrites):
      * 'natural'          — plain SAME conv on (B, H, W, Cin);
      * 'block'            — stride-1 conv in 2x2 block space
                             (B, H/2, W/2, 4Cin) -> (B, H/2, W/2, 4*features);
      * 'block_to_natural' — the stride-2 stage-transition conv consuming block
                             space and emitting natural half-res;
      * 'block_out'        — natural input (B, H, W, Cin) -> block output
                             (B, H/2, W/2, 4*features) via a stride-2 4x4 conv
                             (16/9 FLOPs, 4x output lanes — the fast layout
                             for features <= 32 at full resolution);
      * 'block_out_pair'   — ``x`` is a tuple (x_lo, skip): the conv the
                             natural path applies to concat(up2(x_lo), skip),
                             computed as conv_up_block_out(x_lo) +
                             conv_block_out(skip) without materializing the
                             upsample or the concat; block output.
      * 'pair1x1'          — ``x`` is a tuple (shared, per_item, n_items):
                             the 1x1 conv the natural path applies to
                             concat(broadcast(shared), per_item) over a folded
                             (N*n_items) batch, computed as two dots with the
                             kernel split along its input axis — the shared
                             half projects ONCE per group of n_items rows and
                             broadcasts (DiscoNet's fusion scorer: the ego map
                             is identical for all senders of a receiver, so
                             the concat input — ~1.2 GB fp32 at the reference
                             geometry, batch 16 — is never materialized and
                             the shared half's FLOPs drop n_items-fold).
                             ``shared`` is (N, H, W, Cs), ``per_item`` is
                             (N*n_items, H, W, Cp); output (N*n_items, H, W, F).
                             Exact up to f32 accumulation order (both halves
                             accumulate fp32; the fused conv sums Cs+Cp terms
                             in one chain).
    Params are canonical (k, k, Cin, features) in every mode, so block space is
    a pure runtime layout choice — checkpoints are mode-independent. BatchNorm
    in block mode reduces over the (4, C)-reshaped tile axis, which reproduces
    the natural per-channel statistics exactly (the 4 block offsets partition
    the pixels); stats/params stay (C,)-shaped.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    dtype: str = "bfloat16"
    # True -> BatchNorm statistics exclude rows where sample_mask is False
    # (fusion scorers on the folded pair batch; see MaskedBatchNorm). The
    # choice is structural so train and eval share one module tree.
    masked_bn: bool = False

    @nn.compact
    def __call__(
        self, x, train: bool = False, mode: str = "natural", sample_mask=None
    ) -> jnp.ndarray:
        from disconet_tpu.ops.blockspace import (
            conv_block_out,
            conv_block_s1,
            conv_block_s2,
            conv_up_block_out,
        )

        cdt = _dtype(self.dtype)
        if mode in ("block_out_pair", "pair1x1"):
            cin = x[0].shape[-1] + x[1].shape[-1]
        else:
            cin = x.shape[-1] // (4 if mode in ("block", "block_to_natural") else 1)
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, cin, self.features),
            jnp.float32,
        )
        # the block_out transforms take the canonical f32 kernel (tap sums
        # stay f32; the compute-dtype cast happens after the transform)
        if mode == "pair1x1":
            assert self.stride == 1 and self.kernel == 1
            shared, per_item, n_items = x
            Cs = shared.shape[-1]
            dot = functools.partial(
                jax.lax.dot_general,
                dimension_numbers=(((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s_proj = dot(shared.astype(cdt), w[0, 0, :Cs].astype(cdt))
            p_proj = dot(per_item.astype(cdt), w[0, 0, Cs:].astype(cdt))
            N, H, W, F = s_proj.shape
            x = (s_proj[:, None] + p_proj.reshape(N, n_items, H, W, F)).reshape(
                N * n_items, H, W, F
            )
        elif mode == "block_out_pair":
            assert self.stride == 1 and self.kernel == 3
            x_lo, skip = x
            c_lo = x_lo.shape[-1]
            x = conv_up_block_out(x_lo.astype(cdt), w[:, :, :c_lo]) + conv_block_out(
                skip.astype(cdt), w[:, :, c_lo:]
            )
        elif mode == "block_out":
            assert self.stride == 1 and self.kernel == 3
            x = conv_block_out(x.astype(cdt), w)
        elif mode == "block":
            assert self.stride == 1 and self.kernel == 3
            x = conv_block_s1(x.astype(cdt), w.astype(cdt))
        elif mode == "block_to_natural":
            assert self.stride == 2 and self.kernel == 3
            x = conv_block_s2(x.astype(cdt), w.astype(cdt))
        else:
            # explicit symmetric k//2 padding = torch Conv2d(padding=k//2).
            # At stride 1 this equals XLA SAME; at stride 2 SAME pads the high
            # side only (taps 2p..2p+2) while torch reads 2p-1..2p+1 — using
            # SAME here would shift every downsampled feature map one input
            # pixel vs reference .pth checkpoints (the .pth bridge's forward-
            # parity contract, SURVEY.md §5.5)
            p = self.kernel // 2
            x = jax.lax.conv_general_dilated(
                x.astype(cdt),
                w.astype(cdt),
                (self.stride, self.stride),
                ((p, p), (p, p)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        # momentum 0.9 = torch BatchNorm2d default (momentum=0.1 decay); flax's
        # 0.99 default leaves running stats stale for 100-epoch runs — stale
        # stats put eval-mode detections in the wrong place entirely
        if self.masked_bn:
            # name matches nn.BatchNorm's auto-name: checkpoint trees stay
            # interchangeable between the masked and unmasked variants
            mbn = MaskedBatchNorm(momentum=0.9, name="BatchNorm_0")
            return nn.relu(
                mbn(x.astype(jnp.float32), sample_mask, use_running_average=not train)
            )
        bn = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
        )
        if mode in ("block", "block_out", "block_out_pair"):
            # the 4 block offsets partition the pixels, so reducing over the
            # extra axis reproduces the natural per-channel statistics exactly
            B, P, Q, C4 = x.shape
            x = bn(x.astype(jnp.float32).reshape(B, P, Q, 4, self.features))
            x = x.reshape(B, P, Q, C4)
        else:
            x = bn(x.astype(jnp.float32))
        # stays f32 out: XLA sinks the consumer-side bf16 casts into this op's
        # fusion (measured: forcing bf16 output here changed e2e throughput by
        # <0.1%), and an explicit bf16 output breaks the CPU test backend's
        # shard_map dots (DotThunk: BF16 x BF16 = F32 unimplemented)
        return nn.relu(x)


class _EncoderStage(nn.Module):
    """Two ConvBNRelu; ``mode`` applies to both convs. For the stage after a
    block-space stage, ``transition=True`` makes the first (stride-2) conv
    consume block space and emit natural half-res."""

    features: int
    stride: int
    dtype: str

    @nn.compact
    def __call__(self, x, train: bool = False, mode: str = "natural", transition: bool = False):
        from disconet_tpu.ops.blockspace import depth_to_space

        if mode == "block_out":
            # natural in/out; each conv runs as the stride-2 4x4 block-OUT
            # rewrite (16/9 FLOPs, 4x output lanes) + cheap d2s of the small
            # half-res output. Same params as natural (stage 0 only: stride 1).
            assert self.stride == 1
            x = ConvBNRelu(self.features, dtype=self.dtype)(x, train, mode="block_out")
            x = depth_to_space(x)
            x = ConvBNRelu(self.features, dtype=self.dtype)(x, train, mode="block_out")
            return depth_to_space(x)
        first = "block_to_natural" if transition else mode
        x = ConvBNRelu(self.features, stride=self.stride, dtype=self.dtype)(x, train, mode=first)
        x = ConvBNRelu(self.features, dtype=self.dtype)(x, train, mode="natural" if transition else mode)
        return x


class _DecoderStage(nn.Module):
    """Upsample 2x, concat skip, two ConvBNRelu.

    In block mode the skip is already in block space and the 2x nearest
    upsample of ``x`` is a pure channel broadcast (every pixel of an upsampled
    block is the same source pixel), so nothing is materialized at full res;
    the convs then run in block space. Output stays in block space — the
    caller d2s-es once before the head conv.
    """

    features: int
    dtype: str

    @nn.compact
    def __call__(self, x, skip, train: bool = False, mode: str = "natural"):
        from disconet_tpu.ops.blockspace import depth_to_space

        if mode == "block_out":
            # natural x (half-res) + natural skip -> both convs emit block
            # layout (4x output lanes); d2s of the small outputs restores
            # natural. Param shapes match the natural mode exactly.
            y = ConvBNRelu(self.features, dtype=self.dtype)(
                (x, skip), train, mode="block_out_pair"
            )
            y = depth_to_space(y)
            y = ConvBNRelu(self.features, dtype=self.dtype)(y, train, mode="block_out")
            return depth_to_space(y)
        if mode == "block":
            B, P, Q, Cx = x.shape
            Cs = skip.shape[-1] // 4
            xb = jnp.broadcast_to(x[..., None, :], (B, P, Q, 4, Cx))
            sb = skip.astype(x.dtype).reshape(B, P, Q, 4, Cs)
            x = jnp.concatenate([xb, sb], axis=-1).reshape(B, P, Q, 4 * (Cx + Cs))
        else:
            x = upsample2x(x)
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        x = ConvBNRelu(self.features, dtype=self.dtype)(x, train, mode=mode)
        x = ConvBNRelu(self.features, dtype=self.dtype)(x, train, mode=mode)
        return x


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x spatial upsample for (..., H, W, C)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class STPN(nn.Module):
    """Spatio-temporal pyramid network: staged encoder + skip decoder.

    ``encode`` returns the per-stage feature list (strides 1,2,4,8,16);
    ``decode`` consumes it (with any stage possibly replaced by a fused map) and
    returns (head_input, decoder_features_for_KD).
    """

    channels: Sequence[int] = (32, 64, 128, 256, 512)
    head_channels: int = 128
    dtype: str = "bfloat16"
    # run stage 0 (and the matching decoder stage) in 2x2 block space — an
    # exact rewrite (ops/blockspace.py) that lifts the narrow 256^2 convs off
    # the MXU's 32-lane ceiling; feats[0] is then block-shaped internally
    block_space: bool = False
    # run decoder stage 0's convs in block-OUT form (natural layouts at the
    # stage boundary, block layout only inside): the stride-2 4x4 rewrite of
    # ops/blockspace.py — measured faster than both natural and block_space
    # at the reference geometry (see config.block_out)
    block_out: bool = False
    # extend block-OUT to decoder stage 1 (64ch at half the lane width)
    block_out_dec1: bool = False
    # apply the same rewrite to encoder stage 0 — measured NEGATIVE at the
    # reference geometry (e2e 202 -> 191 scenes/s on v5e): the 13-channel BEV
    # input conv gains nothing from 4x output lanes that XLA's own handling of
    # the narrow input doesn't already get, and the two extra d2s relayouts
    # cost wall time. Kept as a tested mode; default off.
    block_out_encoder: bool = False
    # storage dtype of the head_conv output (config.head_in_dtype): "bfloat16"
    # halves the HBM round-trip of the network's largest activation; the det
    # heads matmul casts to compute dtype anyway, so det outputs are identical
    head_in_dtype: str = "float32"

    def setup(self):
        assert not (self.block_space and (self.block_out or self.block_out_encoder)), (
            "block_space and block_out are alternative rewrites of the same "
            "stage-0 convs; enable at most one"
        )
        self.stages = [
            _EncoderStage(c, stride=(1 if i == 0 else 2), dtype=self.dtype)
            for i, c in enumerate(self.channels)
        ]
        # decoder stage i upsamples from stage i+1 depth back to channels[i]
        self.dec = [
            _DecoderStage(self.channels[i], dtype=self.dtype)
            for i in range(len(self.channels) - 1)
        ]
        self.head_conv = ConvBNRelu(self.head_channels, dtype=self.dtype)

    def encode(self, x: jnp.ndarray, train: bool = False, upto: int | None = None):
        """Run encoder stages 0..upto (inclusive); returns list of stage outputs.

        With ``block_space``, the input is space-to-depth'ed once, stage 0 runs
        in block space (feats[0] is (B, H/2, W/2, 4*C0)), and stage 1's first
        stride-2 conv consumes block space directly — no d2s on the hot path.
        """
        from jax.ad_checkpoint import checkpoint_name

        from disconet_tpu.ops.blockspace import space_to_depth

        feats = []
        n = len(self.stages) if upto is None else upto + 1
        for i in range(n):
            if self.block_space and i == 0:
                x = self.stages[0](space_to_depth(x), train, mode="block")
            elif self.block_space and i == 1:
                x = self.stages[1](x, train, transition=True)
            elif self.block_out_encoder and i == 0:
                x = self.stages[0](x, train, mode="block_out")
            else:
                x = self.stages[i](x, train)
            # no-op tag: under config.train_remat the train step's
            # save_only_these_names policy keeps stage boundaries and
            # rematerializes everything between them in the backward
            x = checkpoint_name(x, "stage_boundary")
            feats.append(x)
        return feats

    def decode_step(self, x, feats, i: int, train: bool = False):
        """One decoder stage with the layout-mode dispatch (block_space /
        block_out / natural). The single source of truth for which rewrite a
        stage runs — profiling tools call this per stage so their attribution
        cannot diverge from :meth:`decode`."""
        from disconet_tpu.ops.blockspace import depth_to_space

        if self.block_space and i == 0:
            return depth_to_space(self.dec[0](x, feats[0], train, mode="block"))
        if self.block_out and (i == 0 or (i == 1 and self.block_out_dec1)):
            return self.dec[i](x, feats[i], train, mode="block_out")
        return self.dec[i](x, feats[i], train)

    def decode(self, feats, train: bool = False):
        """Skip-decoder over the stage list -> (head_input, kd_feature_list).

        kd features are the decoder outputs coarse->fine plus the head input —
        the per-pixel distillation targets (SURVEY.md §4.3).
        """
        from jax.ad_checkpoint import checkpoint_name

        x = feats[-1]
        kd_feats = []
        for i in reversed(range(len(self.dec))):
            x = checkpoint_name(self.decode_step(x, feats, i, train), "stage_boundary")
            kd_feats.append(x)
        head_in = self.head_conv(x, train)
        if self.head_in_dtype != "float32":
            head_in = head_in.astype(_dtype(self.head_in_dtype))
        head_in = checkpoint_name(head_in, "stage_boundary")
        kd_feats.append(head_in)
        return head_in, kd_feats

    def __call__(self, x: jnp.ndarray, train: bool = False):
        return self.decode(self.encode(x, train), train)


class DetectionHeads(nn.Module):
    """1x1-conv classification + regression heads at stride 1 (SURVEY.md C11).

    Outputs fp32: (B, H, W, A, num_classes) logits and (B, H, W, A, code) deltas.

    The two heads are separate parameters (reference .pth layout) but execute
    as ONE conv: the 1.6 GB head input is read once instead of twice, and the
    matmul runs bf16 on the MXU with fp32 accumulation (concatenating the
    weights along the output axis then splitting the result is exact).

    The raw packed tensor is returned alongside the logical views with the cls
    block reordered CLASS-major ([all class-0 | all class-1] over anchors):
    the predict path (training/det_module.py) reads foreground scores as a
    difference of two contiguous lane slices and gathers reg rows directly,
    instead of forcing a relayout of the ~1.2 GB head outputs into the tiny
    trailing (anchor, class)/(anchor, code) dims (measured ~10 ms/96 frames
    at the reference geometry).
    """

    num_anchors: int
    num_classes: int
    box_code_size: int
    dtype: str = "bfloat16"
    # storage dtype of the returned packed tensor (config.head_raw_dtype);
    # the fp32 cls/reg views are always sliced from the fp32 accumulator
    raw_dtype: str = "float32"

    @nn.compact
    def __call__(
        self, x: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        B, H, W, C = x.shape
        NA, NC, code = self.num_anchors, self.num_classes, self.box_code_size
        n_cls, n_reg = NA * NC, NA * code
        w_cls = self.param("cls_kernel", nn.initializers.lecun_normal(), (1, 1, C, n_cls), jnp.float32)
        b_cls = self.param("cls_bias", nn.initializers.zeros, (n_cls,), jnp.float32)
        w_reg = self.param("reg_kernel", nn.initializers.lecun_normal(), (1, 1, C, n_reg), jnp.float32)
        b_reg = self.param("reg_bias", nn.initializers.zeros, (n_reg,), jnp.float32)
        # param columns are anchor-major (col = a*NC + c, the logical layout);
        # the packed output is class-major (col = c*NA + a) via a column
        # permutation of the same params — exact, no extra FLOPs
        perm = lambda w: w.reshape(C, NA, NC).transpose(0, 2, 1).reshape(C, n_cls)
        cdt = _dtype(self.dtype)
        w = jnp.concatenate([perm(w_cls[0, 0]), w_reg[0, 0]], axis=-1).astype(cdt)
        raw = jax.lax.dot_general(
            x.reshape(-1, C).astype(cdt),
            w,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(B, H, W, n_cls + n_reg)
        b_cls_perm = b_cls.reshape(NA, NC).T.reshape(n_cls)
        raw = raw + jnp.concatenate([b_cls_perm, b_reg])
        cls = raw[..., :n_cls].reshape(B, H, W, NC, NA).swapaxes(-1, -2)
        reg = raw[..., n_cls:].reshape(B, H, W, NA, code)
        # 4th output: the fp32 accumulator pre-storage-cast — the packed-loss
        # path (ops/losses.py packed_det_losses) trains on full-precision
        # logits while predict keeps the bf16-stored tensor; XLA dead-code
        # eliminates whichever a jitted graph doesn't consume.
        return cls, reg, raw.astype(_dtype(self.raw_dtype)), raw


class SegHead(nn.Module):
    """1x1-conv per-cell semantic head (SURVEY.md C19): (B, H, W, num_classes)."""

    num_classes: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(self.num_classes, (1, 1), param_dtype=jnp.float32)(
            x.astype(jnp.float32)
        )


def make_stpn(config: Config, allow_block: bool = True) -> STPN:
    """``allow_block=False`` forces natural layout (e.g. fusion at layer 0,
    where the fused feature map must be spatially addressable)."""
    block_space = allow_block and getattr(config, "block_space", False)
    return STPN(
        channels=tuple(config.backbone_channels),
        head_channels=config.head_channels,
        dtype=config.compute_dtype,
        block_space=block_space,
        # block_out keeps every stage-boundary layout natural, so it composes
        # with any fusion layer (no allow_block gate needed). An explicitly
        # enabled block_space rewrites the same convs, so it takes precedence
        # over the default-on block_out.
        block_out=getattr(config, "block_out", False) and not block_space,
        block_out_dec1=getattr(config, "block_out_dec1", False) and not block_space,
        head_in_dtype=getattr(config, "head_in_dtype", "float32"),
    )


def make_heads(config: Config) -> DetectionHeads:
    return DetectionHeads(
        num_anchors=config.num_anchors,
        num_classes=config.num_classes,
        box_code_size=config.box_code_size,
        dtype=config.compute_dtype,
        raw_dtype=getattr(config, "head_raw_dtype", "float32"),
    )
