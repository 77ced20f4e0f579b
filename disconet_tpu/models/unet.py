"""UNet backbone for BEV segmentation (SURVEY.md C19, reference
coperception/models/seg/*: UNet base + fusion variants mirroring det).

The reference seg zoo is a classic UNet (milesial lineage): DoubleConv input
block, 4 maxpool-DoubleConv downs (64-128-256-512-512), 4 upsample-concat-
DoubleConv ups back to a 64-channel stride-1 map, 1x1 output conv. This module
reproduces that *topology* with the TPU-native building blocks used everywhere
else in the package (NHWC ConvBNRelu: bf16 MXU convs, fp32 BatchNorm,
torch-compatible padding) and a nearest-neighbor upsample (a pure
reshape/broadcast that fuses into the following conv, models/backbone.py) in
place of the reference's bilinear — the documented TPU deviation, measured in
the STPN-vs-UNet A/B recorded in BASELINE.md.

Interface-compatible with STPN (``encode`` -> per-stage features at strides
1,2,4,8,16; ``decode`` -> (head_input, kd_feats)), so every fusion model
(DiscoNet/V2V/When2com/naive) runs on either backbone unchanged — the rebuild
equivalent of the reference's per-fusion UNet subclasses.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from disconet_tpu.config import Config
from disconet_tpu.models.backbone import ConvBNRelu, _DecoderStage


class _DoubleConv(nn.Module):
    """Two 3x3 ConvBNRelu — the UNet DoubleConv block."""

    features: int
    dtype: str

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNRelu(self.features, dtype=self.dtype)(x, train)
        return ConvBNRelu(self.features, dtype=self.dtype)(x, train)


class UNet(nn.Module):
    """Classic UNet as a staged encoder/decoder (STPN-interface-compatible).

    Encoder: DoubleConv(channels[0]) then, per stage i>=1, 2x2 maxpool +
    DoubleConv(channels[i]) — the reference's Down block. Decoder stage i
    consumes the deeper map + skip ``feats[i]`` (nearest upsample, concat,
    DoubleConv) and emits ``channels[max(i-1, 0)]`` features, matching the
    classic bilinear-factor-2 UNet widths (512+512 -> 256 -> 128 -> 64 -> 64).
    """

    channels: Sequence[int] = (64, 128, 256, 512, 512)
    dtype: str = "bfloat16"

    def setup(self):
        self.stages = [
            _DoubleConv(c, dtype=self.dtype) for c in self.channels
        ]
        self.dec = [
            _DecoderStage(self.channels[max(i - 1, 0)], dtype=self.dtype)
            for i in range(len(self.channels) - 1)
        ]

    def encode(self, x: jnp.ndarray, train: bool = False, upto: int | None = None):
        from jax.ad_checkpoint import checkpoint_name

        feats = []
        n = len(self.stages) if upto is None else upto + 1
        for i in range(n):
            if i > 0:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            # no-op tag for config.train_remat (see backbone.py encode)
            x = checkpoint_name(self.stages[i](x, train), "stage_boundary")
            feats.append(x)
        return feats

    def decode_step(self, x, feats, i: int, train: bool = False):
        # _DecoderStage natural mode = UNet Up: nearest-up 2x, concat skip,
        # DoubleConv (two ConvBNRelu)
        return self.dec[i](x, feats[i], train)

    def decode(self, feats, train: bool = False):
        from jax.ad_checkpoint import checkpoint_name

        x = feats[-1]
        kd_feats = []
        for i in reversed(range(len(self.dec))):
            x = checkpoint_name(self.decode_step(x, feats, i, train), "stage_boundary")
            kd_feats.append(x)
        # the stride-1 64-ch map IS the head input (the reference UNet's outc
        # 1x1 conv is the caller's SegHead); no extra head_conv like STPN
        return x, kd_feats

    def __call__(self, x: jnp.ndarray, train: bool = False):
        return self.decode(self.encode(x, train), train)


def make_unet(config: Config) -> UNet:
    return UNet(
        channels=tuple(getattr(config, "unet_channels", (64, 128, 256, 512, 512))),
        dtype=config.compute_dtype,
    )


def use_unet(config: Config, task: str) -> bool:
    """Backbone dispatch for seg models (config.seg_backbone)."""
    return task == "seg" and getattr(config, "seg_backbone", "stpn") == "unet"
