"""FaFNet single-agent detector + TeacherNet (SURVEY.md C15, C14).

FaFNet = backbone + heads with no collaboration. It serves as
  * the **lowerbound** (each agent sees only its own BEV, ``--bound lowerbound``);
  * the **upperbound** (same architecture fed the holistic early-fusion BEV,
    ``--bound upperbound``) — the loader swaps the input (dataset.py);
  * the **TeacherNet** (upperbound run with KD feature taps, reference
    models/det/TeacherNet.py): identical architecture, frozen during student
    training, exposing decoder features per agent-frame for distillation.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from disconet_tpu.config import Config
from disconet_tpu.models.backbone import SegHead, make_heads, make_stpn
from disconet_tpu.models.base import agents_to_batch, batch_to_agents


class FaFNet(nn.Module):
    """Single-agent model: backbone + task heads, agents folded into batch.

    ``task='seg'`` makes this the reference's single-agent UNet segmenter
    (SURVEY.md C19): ``config.seg_backbone`` selects the faithful UNet
    topology (models/unet.py, the default) or the det STPN pyramid with a
    1x1 SegHead (both A/B-measured in BASELINE.md).
    """

    config: Config
    kd_flag: bool = False
    task: str = "det"

    def setup(self):
        from disconet_tpu.models.unet import make_unet, use_unet

        # seg dispatches on config.seg_backbone (SURVEY.md C19: the reference's
        # single-agent seg model IS a UNet); attribute name stays 'stpn' so
        # checkpoint scope and decode plumbing are backbone-independent
        if use_unet(self.config, self.task):
            self.stpn = make_unet(self.config)
        else:
            self.stpn = make_stpn(self.config)
        if self.task == "det":
            self.heads = make_heads(self.config)
        else:
            self.seg_head = SegHead(self.config.num_seg_classes)

    def __call__(self, bev, trans=None, agent_mask=None, train: bool = False):
        B, A = bev.shape[0], bev.shape[1]
        x = agents_to_batch(bev.astype(jnp.float32))
        head_in, kd_feats = self.stpn(x, train)
        if self.task == "det":
            cls, reg, raw, raw_f32 = self.heads(head_in)
            out = {
                "cls": batch_to_agents(cls, B, A),
                "reg": batch_to_agents(reg, B, A),
                "head_raw": batch_to_agents(raw, B, A),
                "head_raw_f32": batch_to_agents(raw_f32, B, A),
            }
        else:
            out = {"seg": batch_to_agents(self.seg_head(head_in), B, A)}
        if self.kd_flag:
            out["kd_feats"] = [
                batch_to_agents(f.astype(jnp.float32), B, A) for f in kd_feats
            ]
        return out


class TeacherNet(FaFNet):
    """Early-collaboration teacher (SURVEY.md C14): FaFNet over the holistic BEV.

    Always returns KD feature taps; run with frozen params (caller applies
    stop_gradient / never passes its params to the optimizer) per README.md:59
    (``--resume_teacher``).
    """

    kd_flag: bool = True
