"""Model zoo (SURVEY.md C11-C19): STPN backbone, FaFNet/Teacher, fusion models."""

from disconet_tpu.models.backbone import STPN, DetectionHeads, ConvBNRelu  # noqa: F401
from disconet_tpu.models.base import (  # noqa: F401
    agents_to_batch,
    batch_to_agents,
    warp_all_pairs,
    IntermediateFusionModel,
)
from disconet_tpu.models.faf_net import FaFNet, TeacherNet  # noqa: F401
from disconet_tpu.models.disco_net import DiscoNet, PixelWeightedFusion  # noqa: F401
from disconet_tpu.models.v2v_net import V2VNet  # noqa: F401
from disconet_tpu.models.when2com import When2com  # noqa: F401
from disconet_tpu.models.naive_fusion import (  # noqa: F401
    SumFusion,
    MeanFusion,
    MaxFusion,
    CatFusion,
    AgentWiseWeightedFusion,
)
from disconet_tpu.models.build import build_model  # noqa: F401
