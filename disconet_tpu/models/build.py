"""Model factory mapping the reference CLI surface to model classes.

``--com {'', when2com, who2com, v2v, disco, sum, mean, max, cat, agent}`` and
``--bound {lowerbound, upperbound}`` (SURVEY.md C22, README.md:54-76). An empty
``--com`` with a ``--bound`` selects FaFNet (the input swap between lower/upper
bound happens in the dataset, SURVEY.md C15).
"""

from __future__ import annotations

from disconet_tpu.config import Config
from disconet_tpu.models.disco_net import DiscoNet
from disconet_tpu.models.faf_net import FaFNet, TeacherNet
from disconet_tpu.models.naive_fusion import (
    AgentWiseWeightedFusion,
    CatFusion,
    MaxFusion,
    MeanFusion,
    SumFusion,
)
from disconet_tpu.models.v2v_net import V2VNet
from disconet_tpu.models.when2com import When2com

_FUSION = {
    "disco": DiscoNet,
    "v2v": V2VNet,
    "sum": SumFusion,
    "mean": MeanFusion,
    "max": MaxFusion,
    "cat": CatFusion,
    "agent": AgentWiseWeightedFusion,
}


def build_model(
    com: str,
    config: Config,
    kd_flag: bool = False,
    layer: int = 3,
    warp_flag: bool = True,
    task: str = "det",
    gru_rounds: int = 0,
):
    """Instantiate the model for a ``--com`` / ``--bound`` selection.

    ``task='seg'`` yields the segmentation variant of the same fusion model
    (SURVEY.md C19: the seg model zoo mirrors det). ``gru_rounds`` (v2v only)
    overrides V2VNet's message-passing round count (0 = the model default, 3 —
    the CLIs' ``--gru_rounds`` ablation knob; a checkpoint must be evaluated
    with the round count it trained with).
    """
    com = (com or "").lower()
    if gru_rounds and com != "v2v":
        raise ValueError(f"--gru_rounds applies to --com v2v only (got '{com}')")
    if com == "v2v" and gru_rounds:
        return V2VNet(config=config, kd_flag=kd_flag, layer=layer, task=task,
                      rounds=gru_rounds)
    if com in ("", "lowerbound", "upperbound", "faf"):
        return FaFNet(config=config, kd_flag=kd_flag, task=task)
    if com == "teacher":
        return TeacherNet(config=config, task=task)
    if com in ("when2com", "who2com"):
        return When2com(
            config=config,
            kd_flag=kd_flag,
            layer=layer,
            warp_flag=warp_flag,
            hard_select=(com == "who2com"),
            task=task,
        )
    if com in _FUSION:
        return _FUSION[com](config=config, kd_flag=kd_flag, layer=layer, task=task)
    raise ValueError(f"unknown --com '{com}'")
