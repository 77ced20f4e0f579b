"""V2VNet baseline (SURVEY.md C16, reference models/det/V2VNet.py; V2VNet/when2com
lineage per README.md:107).

GNN message passing at the fusion layer: for each round, every agent's current
hidden state is warped into every receiver's frame, messages are formed from
cat(receiver state, warped sender state), aggregated by a masked mean over
present senders, and the hidden state is updated with a ConvGRU. After N rounds
(default 3) the hidden state replaces the layer-k feature map.

The reference re-warps per round inside python loops; here each round is one
vmapped warp + one batched conv — the round loop is a short static python loop
that XLA unrolls into a single graph.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from disconet_tpu.models.base import (
    IntermediateFusionModel,
    masked_sender_reduce,
    warp_all_pairs,
)


class ConvGRU(nn.Module):
    """Convolutional GRU cell over NHWC maps."""

    features: int
    kernel: int = 3

    @nn.compact
    def __call__(self, h: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        def conv(name):
            return nn.Conv(
                self.features,
                (self.kernel, self.kernel),
                padding="SAME",
                param_dtype=jnp.float32,
                name=name,
            )

        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(conv("update")(hx))
        r = nn.sigmoid(conv("reset")(hx))
        cand = jnp.tanh(conv("cand")(jnp.concatenate([r * h, x], axis=-1)))
        return (1.0 - z) * h + z * cand


class V2VNet(IntermediateFusionModel):
    """Multi-round GNN fusion with ConvGRU state updates."""

    rounds: int = 3

    def setup_fusion(self):
        C = self.layer_channels
        self.msg_conv = nn.Conv(C, (3, 3), padding="SAME", param_dtype=jnp.float32)
        self.gru = ConvGRU(C)

    def fuse(self, feats_k, warped, agent_mask, train, trans=None):
        B, Ar, As, h, w, C = warped.shape
        extent = self.config.area_extents[:2]
        hidden = feats_k  # (B, A, h, w, C)
        # round 1 reuses the skeleton's warped tensor; later rounds re-warp the
        # updated hidden states (poses are static, features are not)
        for r in range(self.rounds):
            if r > 0:
                warped = warp_all_pairs(hidden, trans, extent)
            ego = jnp.broadcast_to(hidden[:, :, None], warped.shape)
            pair = jnp.concatenate([ego, warped], axis=-1)
            msg = nn.relu(self.msg_conv(pair.reshape(B * Ar * As, h, w, 2 * C)))
            msg = msg.reshape(B, Ar, As, h, w, C)
            agg = masked_sender_reduce(msg, agent_mask, "mean")  # (B, A, h, w, C)
            hidden = self.gru(
                hidden.reshape(B * Ar, h, w, C), agg.reshape(B * Ar, h, w, C)
            ).reshape(B, Ar, h, w, C)
        return hidden
