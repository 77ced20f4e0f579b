"""disconet_tpu — TPU-native multi-agent collaborative perception framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of ai4ce/DiscoNet and
its coperception library (see SURVEY.md): BEV voxelization, MotionNet-style conv
backbone, pose-aware feature warping, DiscoGraph matrix-valued edge-weight fusion,
teacher-student knowledge distillation, detection / segmentation / tracking.
"""

__version__ = "0.1.0"

from disconet_tpu.config import Config, ConfigGlobal, tiny_config  # noqa: F401
