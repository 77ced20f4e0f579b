"""Naive fusion baselines (SURVEY.md C18): the ``--com sum/mean/max/cat/agent``
options — reference models/det/{Sum,Mean,Max,Cat,AgentWiseWeighted}Fusion.py.

All operate on the warped all-pairs tensor from the shared fusion core; they are
one masked reduction each, which is exactly why they exist: they unit-test the
fusion core independent of any learned weighting.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from disconet_tpu.models.backbone import ConvBNRelu
from disconet_tpu.models.base import (
    IntermediateFusionModel,
    masked_sender_reduce,
    sender_softmax,
)


class SumFusion(IntermediateFusionModel):
    def fuse(self, feats_k, warped, agent_mask, train, trans=None):
        return masked_sender_reduce(warped, agent_mask, "sum")


class MeanFusion(IntermediateFusionModel):
    def fuse(self, feats_k, warped, agent_mask, train, trans=None):
        return masked_sender_reduce(warped, agent_mask, "mean")


class MaxFusion(IntermediateFusionModel):
    def fuse(self, feats_k, warped, agent_mask, train, trans=None):
        return masked_sender_reduce(warped, agent_mask, "max")


class CatFusion(IntermediateFusionModel):
    """Concatenate all sender maps (fixed max_agents order, zeros for absent)
    and project back to C with a 3x3 ConvBNRelu — reference CatFusion."""

    def setup_fusion(self):
        self.cat_proj = ConvBNRelu(
            self.layer_channels, dtype=self.config.compute_dtype, masked_bn=True
        )

    def fuse(self, feats_k, warped, agent_mask, train, trans=None):
        B, Ar, As, h, w, C = warped.shape
        m = agent_mask[:, None, :, None, None, None].astype(warped.dtype)
        x = (warped * m).transpose(0, 1, 3, 4, 2, 5).reshape(B * Ar, h, w, As * C)
        # BN statistics over present receivers only (reference loops real agents)
        out = self.cat_proj(x, train, sample_mask=agent_mask.astype(bool).reshape(B * Ar))
        return out.reshape(B, Ar, h, w, C)


class AgentWiseWeightedFusion(IntermediateFusionModel):
    """Scalar (not per-pixel) weight per sender from pooled pair features —
    reference AgentWiseWeightedFusion (SURVEY.md C18)."""

    def setup_fusion(self):
        self.score_conv = ConvBNRelu(
            32, kernel=1, dtype=self.config.compute_dtype, masked_bn=True
        )
        self.score_out = nn.Dense(1, param_dtype=jnp.float32)

    def fuse(self, feats_k, warped, agent_mask, train, trans=None):
        B, Ar, As, h, w, C = warped.shape
        ego = jnp.broadcast_to(feats_k[:, :, None], warped.shape)
        pair = jnp.concatenate([ego, warped], axis=-1).reshape(B * Ar * As, h, w, 2 * C)
        am = agent_mask.astype(bool)
        pair_mask = (am[:, :, None] & am[:, None, :]).reshape(B * Ar * As)
        x = self.score_conv(pair, train, sample_mask=pair_mask)
        pooled = jnp.mean(x, axis=(1, 2))  # (B*Ar*As, 32)
        scores = self.score_out(pooled).reshape(B, Ar, As)
        weights = sender_softmax(
            scores[..., None, None], agent_mask
        )  # (B, Ar, As, 1, 1)
        return jnp.sum(weights[..., None] * warped, axis=2)
