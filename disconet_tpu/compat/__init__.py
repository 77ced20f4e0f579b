"""Cross-framework compatibility: the torch twin of the reference models.

``torch_ref`` re-implements the reference's FaFNet/DiscoNet/V2VNet/When2com
in PyTorch (CPU) from the SURVEY.md spec, with module names matching the
``.pth`` export of ``training/checkpoint.py`` — the forward-parity oracle for
the checkpoint bridge (SURVEY.md §5.5, VERDICT r1 #2).
"""

from disconet_tpu.compat.torch_ref import (  # noqa: F401
    AgentWiseWeightedFusionTorch,
    CatFusionTorch,
    DiscoNetTorch,
    FaFNetTorch,
    V2VNetTorch,
    When2comTorch,
    load_pth_into_torch,
)
