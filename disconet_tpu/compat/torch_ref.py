"""Torch twin of the reference models (SURVEY.md C11-C15; VERDICT r1 #2).

A from-the-SURVEY-spec PyTorch re-implementation of the reference
FaFNet/DiscoNet forward pass (upstream ``coperception/models/det/*``,
tier-[B]; see SURVEY.md §0), written so that

  * its ``state_dict`` key names EXACTLY match the ``.pth`` export of
    ``training/checkpoint.py::save_pth`` (``load_state_dict(strict=True)``
    is the key-naming contract check), and
  * its eval-mode forward matches the JAX rebuild's ≤1e-4 on random BEVs
    (``tests/test_torch_parity.py``) — conv padding, stride-2 alignment,
    nearest upsample, BatchNorm eval statistics, affine_grid/grid_sample
    warping, and the per-pixel sender softmax all verified cross-framework.

This is intentionally written the REFERENCE way (NCHW, python loops over
(receiver, sender) pairs, ``F.affine_grid`` + ``F.grid_sample``) rather than
the rebuild way: it is the oracle, so structural independence from the JAX
implementation is the point. torch-CPU is installed in the image for exactly
this purpose (SURVEY.md §7).

Nothing here imports torch at module import time from the package root —
the ``compat`` subpackage is only imported on demand.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from disconet_tpu.config import Config


class ConvBNReluTorch(nn.Module):
    """3x3 (or kxk) conv (no bias) -> BatchNorm2d -> ReLU.

    Parameter layout mirrors the .pth export: the conv kernel is a bare
    ``weight`` on this module; the BN submodule is named ``BatchNorm_0``.
    """

    def __init__(self, cin: int, cout: int, kernel: int = 3, stride: int = 1):
        super().__init__()
        self.stride = stride
        self.padding = kernel // 2
        self.weight = nn.Parameter(torch.empty(cout, cin, kernel, kernel))
        nn.init.kaiming_normal_(self.weight)
        # flax nn.BatchNorm(momentum=0.9) == torch BatchNorm2d(momentum=0.1)
        self.BatchNorm_0 = nn.BatchNorm2d(cout, eps=1e-5, momentum=0.1)

    def forward(self, x):
        x = F.conv2d(x, self.weight, None, stride=self.stride, padding=self.padding)
        return F.relu(self.BatchNorm_0(x))


class _EncoderStageTorch(nn.Module):
    def __init__(self, cin: int, cout: int, stride: int):
        super().__init__()
        self.ConvBNRelu_0 = ConvBNReluTorch(cin, cout, stride=stride)
        self.ConvBNRelu_1 = ConvBNReluTorch(cout, cout)

    def forward(self, x):
        return self.ConvBNRelu_1(self.ConvBNRelu_0(x))


class _DecoderStageTorch(nn.Module):
    """Nearest 2x upsample -> concat skip -> two ConvBNRelu."""

    def __init__(self, c_deep: int, c_skip: int, cout: int):
        super().__init__()
        self.ConvBNRelu_0 = ConvBNReluTorch(c_deep + c_skip, cout)
        self.ConvBNRelu_1 = ConvBNReluTorch(cout, cout)

    def forward(self, x, skip):
        x = F.interpolate(x, scale_factor=2, mode="nearest")
        x = torch.cat([x, skip], dim=1)
        return self.ConvBNRelu_1(self.ConvBNRelu_0(x))


class STPNTorch(nn.Module):
    """Reference STPN (SURVEY.md C11): staged encoder + skip decoder, NCHW."""

    def __init__(self, in_channels: int, channels, head_channels: int):
        super().__init__()
        self.channels = tuple(channels)
        prev = in_channels
        for i, c in enumerate(self.channels):
            self.add_module(
                f"stages_{i}", _EncoderStageTorch(prev, c, stride=1 if i == 0 else 2)
            )
            prev = c
        for i in range(len(self.channels) - 1):
            self.add_module(
                f"dec_{i}",
                _DecoderStageTorch(self.channels[i + 1], self.channels[i], self.channels[i]),
            )
        self.head_conv = ConvBNReluTorch(self.channels[0], head_channels)

    def encode(self, x):
        feats = []
        for i in range(len(self.channels)):
            x = getattr(self, f"stages_{i}")(x)
            feats.append(x)
        return feats

    def decode(self, feats):
        x = feats[-1]
        for i in reversed(range(len(self.channels) - 1)):
            x = getattr(self, f"dec_{i}")(x, feats[i])
        return self.head_conv(x)

    def forward(self, x):
        return self.decode(self.encode(x))


class HeadsTorch(nn.Module):
    """1x1-conv cls/reg heads; channel k of cls = anchor-major (a*NC + c)."""

    def __init__(self, cin: int, num_anchors: int, num_classes: int, code: int):
        super().__init__()
        self.na, self.nc, self.code = num_anchors, num_classes, code
        self.cls = nn.Conv2d(cin, num_anchors * num_classes, 1)
        self.reg = nn.Conv2d(cin, num_anchors * code, 1)

    def forward(self, x):
        B, _, H, W = x.shape
        cls = self.cls(x).reshape(B, self.na, self.nc, H, W).permute(0, 3, 4, 1, 2)
        reg = self.reg(x).reshape(B, self.na, self.code, H, W).permute(0, 3, 4, 1, 2)
        return cls, reg  # (B, H, W, A, NC) / (B, H, W, A, code)


def theta_from_trans(trans_ij: np.ndarray, extents) -> torch.Tensor:
    """4x4 pose (sender j -> receiver i coords) -> 2x3 normalized affine for
    ``F.affine_grid`` over the receiver's grid, sampling the sender's map.

    Reference ``feature_transformation`` semantics (SURVEY.md C12). Grid
    layout: tensor (C, H, W) with H = metric x, W = metric y; torch grid
    coords are (gx, gy) with gx indexing W and gy indexing H, both normalized
    to [-1, 1] with align_corners=False cell-center convention.
    """
    R = np.asarray(trans_ij, np.float64)[:2, :2]
    t = np.asarray(trans_ij, np.float64)[:2, 3]
    Rinv = np.linalg.inv(R)
    tinv = -Rinv @ t  # receiver metric -> sender metric
    (x_lo, x_hi), (y_lo, y_hi) = extents
    cx, hx = (x_lo + x_hi) / 2.0, (x_hi - x_lo) / 2.0
    cy, hy = (y_lo + y_hi) / 2.0, (y_hi - y_lo) / 2.0
    # metric (mx, my) -> grid coords (gx, gy) = ((my - cy)/hy, (mx - cx)/hx)
    S = np.array([[0.0, 1.0 / hy], [1.0 / hx, 0.0]])
    c = np.array([cx, cy])
    Sinv = np.linalg.inv(S)
    A = S @ Rinv @ Sinv
    b = S @ (Rinv @ (Sinv @ np.zeros(2) + c) + tinv - c)
    theta = np.concatenate([A, b[:, None]], axis=1)
    return torch.from_numpy(theta.astype(np.float32))


def warp_to_receiver(feat_j: torch.Tensor, trans_ij: np.ndarray, extents) -> torch.Tensor:
    """Warp sender-j features (C, h, w) into receiver i's grid — the reference
    affine_grid + grid_sample path (bilinear, zeros padding, align_corners=False)."""
    C, h, w = feat_j.shape
    theta = theta_from_trans(trans_ij, extents)[None]
    grid = F.affine_grid(theta, (1, C, h, w), align_corners=False)
    return F.grid_sample(
        feat_j[None], grid, mode="bilinear", padding_mode="zeros", align_corners=False
    )[0]


class FaFNetTorch(nn.Module):
    """Single-agent reference detector (SURVEY.md C15): STPN + heads."""

    def __init__(self, config: Config):
        super().__init__()
        self.config = config
        Z = config.grid_size[2]
        self.stpn = STPNTorch(Z, config.backbone_channels, config.head_channels)
        self.heads = HeadsTorch(
            config.head_channels, config.num_anchors, config.num_classes,
            config.box_code_size,
        )

    def forward(self, bev: torch.Tensor):
        """bev: (B, A, H, W, Z) float; returns cls/reg shaped like the rebuild:
        (B, A, H, W, NA, NC) and (B, A, H, W, NA, code)."""
        B, A, H, W, Z = bev.shape
        x = bev.reshape(B * A, H, W, Z).permute(0, 3, 1, 2).contiguous()
        head_in = self.stpn(x)
        cls, reg = self.heads(head_in)
        return (
            cls.reshape((B, A) + cls.shape[1:]),
            reg.reshape((B, A) + reg.shape[1:]),
        )


class PixelWeightedFusionTorch(nn.Module):
    """Reference PixelWeightedFusionSoftmax: 1x1 convs 2C->128->32->8->1."""

    def __init__(self, cin2: int):
        super().__init__()
        self.ConvBNRelu_0 = ConvBNReluTorch(cin2, 128, kernel=1)
        self.ConvBNRelu_1 = ConvBNReluTorch(128, 32, kernel=1)
        self.ConvBNRelu_2 = ConvBNReluTorch(32, 8, kernel=1)
        self.Conv_0 = nn.Conv2d(8, 1, 1)

    def forward(self, x):
        return self.Conv_0(self.ConvBNRelu_2(self.ConvBNRelu_1(self.ConvBNRelu_0(x))))


class DiscoNetTorch(nn.Module):
    """Reference DiscoNet student (SURVEY.md C13/§4.3): encode per agent, warp
    every present sender into each receiver's frame at layer k, score pairs
    with the 1x1 stack, per-pixel softmax over present senders, weighted sum,
    decode with per-agent skips. Python loops over (b, i, j) — the reference
    structure, kept as the structurally-independent oracle."""

    def __init__(self, config: Config, layer: int = 3):
        super().__init__()
        self.config = config
        self.layer = layer
        Z = config.grid_size[2]
        self.stpn = STPNTorch(Z, config.backbone_channels, config.head_channels)
        self.heads = HeadsTorch(
            config.head_channels, config.num_anchors, config.num_classes,
            config.box_code_size,
        )
        ck = config.backbone_channels[min(layer, len(config.backbone_channels) - 1)]
        self.weight_net = PixelWeightedFusionTorch(2 * ck)

    def forward(self, bev: torch.Tensor, trans: np.ndarray, agent_mask: np.ndarray):
        """bev (B, A, H, W, Z); trans (B, A, A, 4, 4) numpy; agent_mask (B, A)."""
        B, A, H, W, Z = bev.shape
        x = bev.reshape(B * A, H, W, Z).permute(0, 3, 1, 2).contiguous()
        feats = self.stpn.encode(x)
        k = self.layer
        fk = feats[k].reshape((B, A) + feats[k].shape[1:])  # (B, A, C, h, w)
        extents = self.config.area_extents[:2]

        fused = torch.zeros_like(fk)
        for b in range(B):
            present = [j for j in range(A) if agent_mask[b, j]]
            for i in present:
                warped, scores = [], []
                for j in present:
                    wj = warp_to_receiver(fk[b, j], trans[b, i, j], extents)
                    sij = self.weight_net(torch.cat([fk[b, i], wj], dim=0)[None])[0, 0]
                    warped.append(wj)
                    scores.append(sij)
                Wgt = torch.softmax(torch.stack(scores), dim=0)  # (S, h, w)
                fused[b, i] = (Wgt[:, None] * torch.stack(warped)).sum(dim=0)

        feats = list(feats)
        feats[k] = fused.reshape((B * A,) + fused.shape[2:])
        head_in = self.stpn.decode(feats)
        cls, reg = self.heads(head_in)
        return (
            cls.reshape((B, A) + cls.shape[1:]),
            reg.reshape((B, A) + reg.shape[1:]),
        )


class ConvGRUTorch(nn.Module):
    """Torch twin of models/v2v_net.py::ConvGRU (NCHW)."""

    def __init__(self, features: int, kernel: int = 3):
        super().__init__()
        pad = kernel // 2
        self.update = nn.Conv2d(2 * features, features, kernel, padding=pad)
        self.reset = nn.Conv2d(2 * features, features, kernel, padding=pad)
        self.cand = nn.Conv2d(2 * features, features, kernel, padding=pad)

    def forward(self, h, x):  # both (N, C, h, w)
        hx = torch.cat([h, x], dim=1)
        z = torch.sigmoid(self.update(hx))
        r = torch.sigmoid(self.reset(hx))
        cand = torch.tanh(self.cand(torch.cat([r * h, x], dim=1)))
        return (1.0 - z) * h + z * cand


class V2VNetTorch(nn.Module):
    """Reference V2VNet (SURVEY.md C16): multi-round GNN message passing with
    a ConvGRU state update, re-warping the hidden states every round. Python
    loops over (b, i, j) as the reference does — the structurally-independent
    oracle for models/v2v_net.py."""

    def __init__(self, config: Config, layer: int = 3, rounds: int = 3):
        super().__init__()
        self.config = config
        self.layer = layer
        self.rounds = rounds
        Z = config.grid_size[2]
        self.stpn = STPNTorch(Z, config.backbone_channels, config.head_channels)
        self.heads = HeadsTorch(
            config.head_channels, config.num_anchors, config.num_classes,
            config.box_code_size,
        )
        C = config.backbone_channels[min(layer, len(config.backbone_channels) - 1)]
        self.msg_conv = nn.Conv2d(2 * C, C, 3, padding=1)
        self.gru = ConvGRUTorch(C)

    def forward(self, bev: torch.Tensor, trans: np.ndarray, agent_mask: np.ndarray):
        B, A, H, W, Z = bev.shape
        x = bev.reshape(B * A, H, W, Z).permute(0, 3, 1, 2).contiguous()
        feats = self.stpn.encode(x)
        k = self.layer
        fk = feats[k].reshape((B, A) + feats[k].shape[1:])  # (B, A, C, h, w)
        extents = self.config.area_extents[:2]

        hidden = fk.clone()
        for _ in range(self.rounds):
            new_hidden = hidden.clone()
            for b in range(B):
                present = [j for j in range(A) if agent_mask[b, j]]
                for i in present:
                    msgs = []
                    for j in present:
                        wj = warp_to_receiver(hidden[b, j], trans[b, i, j], extents)
                        pair = torch.cat([hidden[b, i], wj], dim=0)[None]
                        msgs.append(F.relu(self.msg_conv(pair))[0])
                    agg = torch.stack(msgs).mean(dim=0)
                    new_hidden[b, i] = self.gru(hidden[b, i][None], agg[None])[0]
            hidden = new_hidden

        feats = list(feats)
        feats[k] = hidden.reshape((B * A,) + hidden.shape[2:])
        head_in = self.stpn.decode(feats)
        cls, reg = self.heads(head_in)
        return (
            cls.reshape((B, A) + cls.shape[1:]),
            reg.reshape((B, A) + reg.shape[1:]),
        )


class HandshakeEncoderTorch(nn.Module):
    """Torch twin of models/when2com.py::_HandshakeEncoder: two stride-2
    ConvBNRelu, global average pool, Dense."""

    def __init__(self, cin: int, out_dim: int):
        super().__init__()
        self.ConvBNRelu_0 = ConvBNReluTorch(cin, 64, kernel=3, stride=2)
        self.ConvBNRelu_1 = ConvBNReluTorch(64, 32, kernel=3, stride=2)
        self.Dense_0 = nn.Linear(32, out_dim)

    def forward(self, x):  # (N, C, h, w)
        x = self.ConvBNRelu_1(self.ConvBNRelu_0(x))
        return self.Dense_0(x.mean(dim=(2, 3)))


class When2comTorch(nn.Module):
    """Reference When2com/Who2com (SURVEY.md C17): handshake query/key
    attention over senders; ``warp_flag`` selects pose-warped values;
    ``hard_select`` is Who2com's argmax selection at inference."""

    def __init__(self, config: Config, layer: int = 3, query_dim: int = 32,
                 key_dim: int = 32, warp_flag: bool = True,
                 hard_select: bool = False):
        super().__init__()
        self.config = config
        self.layer = layer
        self.key_dim = key_dim
        self.warp_flag = warp_flag
        self.hard_select = hard_select
        Z = config.grid_size[2]
        self.stpn = STPNTorch(Z, config.backbone_channels, config.head_channels)
        self.heads = HeadsTorch(
            config.head_channels, config.num_anchors, config.num_classes,
            config.box_code_size,
        )
        C = config.backbone_channels[min(layer, len(config.backbone_channels) - 1)]
        self.query_net = HandshakeEncoderTorch(C, query_dim)
        self.key_net = HandshakeEncoderTorch(C, key_dim)
        self.attn_w = nn.Linear(query_dim, key_dim, bias=False)

    def forward(self, bev: torch.Tensor, trans: np.ndarray, agent_mask: np.ndarray):
        B, A, H, W, Z = bev.shape
        x = bev.reshape(B * A, H, W, Z).permute(0, 3, 1, 2).contiguous()
        feats = self.stpn.encode(x)
        k = self.layer
        fk = feats[k].reshape((B, A) + feats[k].shape[1:])  # (B, A, C, h, w)
        extents = self.config.area_extents[:2]

        fused = torch.zeros_like(fk)
        for b in range(B):
            present = [j for j in range(A) if agent_mask[b, j]]
            q = self.query_net(fk[b, present])  # (P, qd)
            kv = self.key_net(fk[b, present])  # (P, kd)
            scores = (self.attn_w(q) @ kv.T) / float(self.key_dim) ** 0.5
            attn = torch.softmax(scores, dim=1)  # (P_recv, P_send)
            if self.hard_select:
                attn = F.one_hot(attn.argmax(dim=1), len(present)).to(attn.dtype)
            for pi, i in enumerate(present):
                acc = torch.zeros_like(fk[b, i])
                for pj, j in enumerate(present):
                    vj = (warp_to_receiver(fk[b, j], trans[b, i, j], extents)
                          if self.warp_flag else fk[b, j])
                    acc = acc + attn[pi, pj] * vj
                fused[b, i] = acc

        feats = list(feats)
        feats[k] = fused.reshape((B * A,) + fused.shape[2:])
        head_in = self.stpn.decode(feats)
        cls, reg = self.heads(head_in)
        return (
            cls.reshape((B, A) + cls.shape[1:]),
            reg.reshape((B, A) + reg.shape[1:]),
        )


class CatFusionTorch(nn.Module):
    """Reference CatFusion (SURVEY.md C18): concatenate all sender maps in
    fixed slot order (zeros for absent agents), project back to C with a 3x3
    ConvBNRelu named ``cat_proj`` — the only naive fusion with parameters that
    are not shared with FaFNet."""

    def __init__(self, config: Config, num_slots: int, layer: int = 3):
        super().__init__()
        self.config = config
        self.layer = layer
        Z = config.grid_size[2]
        self.stpn = STPNTorch(Z, config.backbone_channels, config.head_channels)
        self.heads = HeadsTorch(
            config.head_channels, config.num_anchors, config.num_classes,
            config.box_code_size,
        )
        ck = config.backbone_channels[min(layer, len(config.backbone_channels) - 1)]
        # cin tracks the padded agent-slot count of the data it was trained on
        self.cat_proj = ConvBNReluTorch(num_slots * ck, ck, kernel=3)

    def forward(self, bev: torch.Tensor, trans: np.ndarray, agent_mask: np.ndarray):
        B, A, H, W, Z = bev.shape
        x = bev.reshape(B * A, H, W, Z).permute(0, 3, 1, 2).contiguous()
        feats = self.stpn.encode(x)
        k = self.layer
        fk = feats[k].reshape((B, A) + feats[k].shape[1:])  # (B, A, C, h, w)
        extents = self.config.area_extents[:2]

        fused = torch.zeros_like(fk)
        for b in range(B):
            present = [j for j in range(A) if agent_mask[b, j]]
            for i in present:
                slots = [
                    warp_to_receiver(fk[b, j], trans[b, i, j], extents)
                    if agent_mask[b, j] else torch.zeros_like(fk[b, i])
                    for j in range(A)
                ]
                fused[b, i] = self.cat_proj(torch.cat(slots, dim=0)[None])[0]

        feats = list(feats)
        feats[k] = fused.reshape((B * A,) + fused.shape[2:])
        head_in = self.stpn.decode(feats)
        cls, reg = self.heads(head_in)
        return (
            cls.reshape((B, A) + cls.shape[1:]),
            reg.reshape((B, A) + reg.shape[1:]),
        )


class AgentWiseWeightedFusionTorch(nn.Module):
    """Reference AgentWiseWeightedFusion (SURVEY.md C18): one SCALAR weight
    per sender from pooled pair features (1x1 ConvBNRelu -> global mean ->
    Dense), softmax over present senders, weighted sum of warped maps."""

    def __init__(self, config: Config, layer: int = 3):
        super().__init__()
        self.config = config
        self.layer = layer
        Z = config.grid_size[2]
        self.stpn = STPNTorch(Z, config.backbone_channels, config.head_channels)
        self.heads = HeadsTorch(
            config.head_channels, config.num_anchors, config.num_classes,
            config.box_code_size,
        )
        ck = config.backbone_channels[min(layer, len(config.backbone_channels) - 1)]
        self.score_conv = ConvBNReluTorch(2 * ck, 32, kernel=1)
        self.score_out = nn.Linear(32, 1)

    def forward(self, bev: torch.Tensor, trans: np.ndarray, agent_mask: np.ndarray):
        B, A, H, W, Z = bev.shape
        x = bev.reshape(B * A, H, W, Z).permute(0, 3, 1, 2).contiguous()
        feats = self.stpn.encode(x)
        k = self.layer
        fk = feats[k].reshape((B, A) + feats[k].shape[1:])  # (B, A, C, h, w)
        extents = self.config.area_extents[:2]

        fused = torch.zeros_like(fk)
        for b in range(B):
            present = [j for j in range(A) if agent_mask[b, j]]
            for i in present:
                warped, scores = [], []
                for j in present:
                    wj = warp_to_receiver(fk[b, j], trans[b, i, j], extents)
                    pair = torch.cat([fk[b, i], wj], dim=0)[None]
                    pooled = self.score_conv(pair).mean(dim=(2, 3))  # (1, 32)
                    warped.append(wj)
                    scores.append(self.score_out(pooled)[0, 0])
                w = torch.softmax(torch.stack(scores), dim=0)  # (S,)
                fused[b, i] = (w[:, None, None, None] * torch.stack(warped)).sum(dim=0)

        feats = list(feats)
        feats[k] = fused.reshape((B * A,) + fused.shape[2:])
        head_in = self.stpn.decode(feats)
        cls, reg = self.heads(head_in)
        return (
            cls.reshape((B, A) + cls.shape[1:]),
            reg.reshape((B, A) + reg.shape[1:]),
        )


def load_pth_into_torch(model: nn.Module, path: str) -> nn.Module:
    """Load a ``save_pth`` export into the twin with strict=True — missing or
    extra keys fail loudly, making key naming a cross-framework contract."""
    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = ckpt.get("model_state_dict", ckpt)
    # torch tracks num_batches_tracked per BN; the flax export has no such
    # counter (it only matters in torch's momentum=None mode, unused here)
    missing, unexpected = model.load_state_dict(sd, strict=False)
    missing = [m for m in missing if not m.endswith("num_batches_tracked")]
    if missing or unexpected:
        raise KeyError(f"state_dict mismatch: missing={missing} unexpected={unexpected}")
    model.eval()
    return model
