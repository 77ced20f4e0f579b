"""When2com / Who2com baseline (SURVEY.md C17, reference models/det/When2com.py).

Handshake attention: each agent compresses its layer-k map into a small 1-D
query and key ("handshake" vectors); attention over senders is
softmax_j(q_i . k_j / sqrt(d)) (MIMO — every receiver attends over every
sender); the fused map is the attention-weighted sum of sender values.
``warp_flag`` selects whether values are pose-warped into the receiver frame
(the reference's ``--warp_flag`` variant); queries/keys are always computed on
the un-warped ego maps, as in the reference.

Who2com (argmax selection instead of soft attention) is exposed via
``hard_select`` for parity with the reference's inference mode.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from disconet_tpu.models.backbone import ConvBNRelu
from disconet_tpu.models.base import IntermediateFusionModel


class _HandshakeEncoder(nn.Module):
    """Map (B*A, h, w, C) -> (B*A, d) compressed query/key vector."""

    out_dim: int
    dtype: str

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNRelu(64, kernel=3, stride=2, dtype=self.dtype)(x, train)
        x = ConvBNRelu(32, kernel=3, stride=2, dtype=self.dtype)(x, train)
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        return nn.Dense(self.out_dim, param_dtype=jnp.float32)(x)


class When2com(IntermediateFusionModel):
    query_dim: int = 32
    key_dim: int = 32
    warp_flag: bool = True
    hard_select: bool = False  # Who2com-style argmax at inference

    def setup_fusion(self):
        self.query_net = _HandshakeEncoder(self.query_dim, self.config.compute_dtype)
        self.key_net = _HandshakeEncoder(self.key_dim, self.config.compute_dtype)
        # general attention: score = q W k
        self.attn_w = nn.Dense(self.key_dim, use_bias=False, param_dtype=jnp.float32)

    def fuse(self, feats_k, warped, agent_mask, train, trans=None):
        B, Ar, As, h, w, C = warped.shape
        flat = feats_k.reshape(B * Ar, h, w, C)
        q = self.query_net(flat, train).reshape(B, Ar, self.query_dim)
        k = self.key_net(flat, train).reshape(B, As, self.key_dim)
        scores = jnp.einsum("bid,bjd->bij", self.attn_w(q), k) / jnp.sqrt(
            float(self.key_dim)
        )
        neg = jnp.finfo(scores.dtype).min
        scores = jnp.where(agent_mask[:, None, :], scores, neg)
        attn = jax.nn.softmax(scores, axis=2)  # (B, Ar, As)
        if self.hard_select and not train:
            sel = jnp.argmax(attn, axis=2)
            attn = jax.nn.one_hot(sel, As, dtype=attn.dtype)
            attn = attn * agent_mask[:, None, :]
        values = warped if self.warp_flag else jnp.broadcast_to(
            feats_k[:, None], warped.shape
        )
        return jnp.einsum("bij,bijhwc->bihwc", attn, values)
