"""Fusion/communication core (SURVEY.md C12, reference models/det/base/DetModelBase.py).

The reference simulates V2X communication with python loops over (batch,
receiver, sender), one ``grid_sample`` launch per pair (SURVEY.md §4.1 hot spot
1). Here the whole thing is tensor-shaped from the start:

  * the agent axis is a real array axis — ``agents_to_batch`` folds (B, A, ...)
    to (B*A, ...) for the conv stack, exactly the reference's folding but as a
    zero-cost reshape;
  * ``warp_all_pairs`` produces every sender->receiver warp for the whole batch
    as one vmapped bilinear gather, (B, A, A, h, w, C) in a single XLA op tree;
  * absent agents (scenes have 2-6 agents) are carried as a boolean
    ``agent_mask``; :func:`sender_softmax` and the masked reductions guarantee
    padding never leaks into fusion (SURVEY.md §7 "hard parts"). Padded slots
    DO flow through the conv stack and BatchNorm statistics as all-zero BEVs —
    deliberately: the reference folds padded agents through its backbone the
    same way (DetModelBase.agents_to_batch over the collate-padded tensor), so
    masking BN here would break numeric parity with reference checkpoints.

``IntermediateFusionModel`` is the shared skeleton of every ``--com`` model
(SURVEY.md C13, C16-C18): encode per agent -> fuse at ``--layer k`` -> decode
with per-agent skips -> heads. Subclasses implement only ``fuse``.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from disconet_tpu.config import Config
from disconet_tpu.models.backbone import SegHead, make_heads, make_stpn
from disconet_tpu.ops.warp import warp_features, warp_features_matmul
import jax


def agents_to_batch(x: jnp.ndarray) -> jnp.ndarray:
    """(B, A, ...) -> (B*A, ...) — reference DetModelBase.agents_to_batch."""
    return x.reshape((-1,) + x.shape[2:])


def batch_to_agents(x: jnp.ndarray, batch: int, agents: int) -> jnp.ndarray:
    """(B*A, ...) -> (B, A, ...)."""
    return x.reshape((batch, agents) + x.shape[1:])


def warp_all_pairs(
    feats: jnp.ndarray, trans: jnp.ndarray, extent_xy: Tuple
) -> jnp.ndarray:
    """All sender->receiver warps for a batch.

    Args:
        feats: (B, A, h, w, C) per-agent feature maps at the fusion layer.
        trans: (B, A, A, 4, 4); trans[b, i, j] maps sender-j -> receiver-i frame.
        extent_xy: metric ((x_lo, x_hi), (y_lo, y_hi)) of the full map. The
            fusion layer's downsampled grid covers the same metric extent, so
            the same extents apply at every stride.

    Returns:
        (B, A_recv, A_send, h, w, C), zeros outside each sender's field of view.

    Implementation dispatch: the MXU (one-hot matmul) formulation — 3.7x
    faster than the gather version on v5e at the 32x32 fusion grid — builds a
    dense (A, A, H*W, H*W) tap matrix, so it only makes sense while that fits
    comfortably (f32 bytes: A^2 * Q^2 * 4; at Q=1024 and A=6 that's 151 MB per
    scene, at Q=4096 it would be 2.4 GB). Larger fusion grids (--layer <= 2 at
    the 256^2 geometry) use the O(Q) bilinear-gather version, which is also
    the torch-parity precision oracle.
    """
    q = feats.shape[2] * feats.shape[3]
    impl = warp_features_matmul if q <= 1024 else warp_features
    return jax.vmap(lambda f, t: impl(f, t, extent_xy))(feats, trans)


def sender_softmax(scores: jnp.ndarray, agent_mask: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel softmax over the sender axis, masking absent agents.

    Args:
        scores: (B, A_recv, A_send, h, w) raw edge scores.
        agent_mask: (B, A) present-agent mask.
    Returns:
        weights of the same shape; absent senders get exactly 0 weight, and the
        remaining weights sum to 1 over present senders (SURVEY.md §4.3
        invariant: softmax over *present* senders only).
    """
    neg = jnp.finfo(scores.dtype).min
    m = agent_mask[:, None, :, None, None]
    return jax.nn.softmax(jnp.where(m, scores, neg), axis=2)


def masked_sender_reduce(
    warped: jnp.ndarray, agent_mask: jnp.ndarray, op: str
) -> jnp.ndarray:
    """sum/mean/max over the sender axis of (B, Ar, As, h, w, C), mask-aware."""
    m = agent_mask[:, None, :, None, None, None].astype(warped.dtype)
    if op == "sum":
        return jnp.sum(warped * m, axis=2)
    if op == "mean":
        denom = jnp.maximum(jnp.sum(m, axis=2), 1.0)
        return jnp.sum(warped * m, axis=2) / denom
    if op == "max":
        neg = jnp.finfo(warped.dtype).min
        return jnp.max(jnp.where(m > 0, warped, neg), axis=2)
    raise ValueError(op)


class IntermediateFusionModel(nn.Module):
    """Shared forward skeleton of every intermediate-collaboration detector.

    Matches the reference structure (SURVEY.md §4.1/§4.3): the encoder runs all
    stages per agent BEFORE fusion; the fused map replaces the stage-``layer``
    feature in the decoder's skip pyramid (deeper stages keep their per-agent,
    pre-fusion values). Subclasses implement :meth:`fuse`.
    """

    config: Config
    kd_flag: bool = False
    layer: int = 3
    task: str = "det"  # 'det' (cls+reg heads) or 'seg' (per-cell classes, C19)

    def setup(self):
        from disconet_tpu.models.unet import make_unet, use_unet

        # fusion at layer 0 would have to address the fused map spatially, so
        # the block-space stage-0 rewrite is disabled there (backbone.py).
        # Seg models dispatch on config.seg_backbone (SURVEY.md C19): the
        # attribute keeps the name 'stpn' so the fusion/decode plumbing and
        # checkpoint scope are backbone-independent.
        if use_unet(self.config, self.task):
            self.stpn = make_unet(self.config)
        else:
            self.stpn = make_stpn(self.config, allow_block=self.layer != 0)
        if self.task == "det":
            self.heads = make_heads(self.config)
        else:
            self.seg_head = SegHead(self.config.num_seg_classes)
        self.setup_fusion()

    def setup_fusion(self):  # overridable hook for fusion-specific submodules
        pass

    @property
    def layer_channels(self) -> int:
        """Channel width of the features fused at THIS model's ``layer`` —
        unlike ``config.fusion_channels`` (keyed to ``config.fusion_layer``),
        this stays correct when ``build_model(..., layer=k)`` overrides it,
        and tracks the active backbone (UNet widths for seg, SURVEY.md C19)."""
        from disconet_tpu.models.unet import use_unet

        if use_unet(self.config, self.task):
            ch = tuple(getattr(self.config, "unet_channels", (64, 128, 256, 512, 512)))
        else:
            ch = self.config.backbone_channels
        return ch[min(self.layer, len(ch) - 1)]

    def fuse(
        self,
        feats_k: jnp.ndarray,  # (B, A, h, w, C) layer-k features
        warped: jnp.ndarray,  # (B, Ar, As, h, w, C)
        agent_mask: jnp.ndarray,  # (B, A)
        train: bool,
        trans: Optional[jnp.ndarray] = None,  # (B, A, A, 4, 4), for re-warping
    ) -> jnp.ndarray:  # (B, A, h, w, C)
        raise NotImplementedError

    def __call__(
        self,
        bev: jnp.ndarray,  # (B, A, H, W, Z)
        trans: jnp.ndarray,  # (B, A, A, 4, 4)
        agent_mask: jnp.ndarray,  # (B, A) bool
        train: bool = False,
    ):
        B, A = bev.shape[0], bev.shape[1]
        x = agents_to_batch(bev.astype(jnp.float32))
        feats = self.stpn.encode(x, train)

        k = self.layer
        # fusion-layer features arrive f32 (ConvBNRelu emits f32, backbone.py).
        # config.warp_dtype = "bfloat16" applies to INFERENCE only: the one-hot
        # tap matrix and warped maps halve their HBM footprint and the warp
        # einsum runs the bf16 MXU path with f32 accumulation (+1.8% e2e,
        # mAP-identical at eval — measured 0.4134 vs 0.4133 mAP@0.7 on the
        # same checkpoint). Training always warps f32: training WITH bf16
        # warps measured −0.11 mAP@0.7 (0.3085 vs 0.4133 on the synthetic
        # 64-grid benchmark) — the quantized-warp gradients hurt localization
        # convergence even though the forward difference is negligible.
        # TPU-only dispatch (the nms.py pattern): the CPU test backend's
        # sharded DotThunk lacks BF16 x BF16 = F32.
        wdt = (
            jnp.bfloat16
            if getattr(self.config, "warp_dtype", "float32") == "bfloat16"
            and not train
            and jax.default_backend() == "tpu"
            else jnp.float32
        )
        fk = batch_to_agents(feats[k], B, A)
        extent = self.config.area_extents[:2]
        warped = warp_all_pairs(fk.astype(wdt), trans, extent)  # (B, Ar, As, h, w, C)
        # stage-boundary tag (see backbone.py encode): under train_remat the
        # fused map is a saved boundary, so the DECODE stages' backward
        # recomputes from here instead of re-running encode+fuse. (The fuse
        # stage's own backward still recomputes its intermediates — including
        # one warp re-execution — from the saved feats[k]; the tag cannot
        # prevent that, only stop the recompute from cascading further.)
        from jax.ad_checkpoint import checkpoint_name

        fused = checkpoint_name(
            self.fuse(fk, warped, agent_mask, train, trans=trans), "stage_boundary"
        )

        feats = list(feats)
        feats[k] = agents_to_batch(fused)
        head_in, kd_feats = self.stpn.decode(feats, train)
        if self.task == "det":
            cls, reg, raw, raw_f32 = self.heads(head_in)
            out = {
                "cls": batch_to_agents(cls, B, A),
                "reg": batch_to_agents(reg, B, A),
                # packed class-major head output in the conv's natural channel
                # layout — the fast path for predict (see DetectionHeads)
                "head_raw": batch_to_agents(raw, B, A),
                # fp32 packed accumulator — the fast path for the LOSSES
                # (packed_det_losses); unused outputs are DCE'd per graph
                "head_raw_f32": batch_to_agents(raw_f32, B, A),
            }
        else:
            out = {"seg": batch_to_agents(self.seg_head(head_in), B, A)}
        if self.kd_flag:
            out["kd_feats"] = [
                batch_to_agents(f.astype(jnp.float32), B, A) for f in kd_feats
            ]
        return out
