"""Data layer: npy scene schema, synthetic V2X scenes, loaders (SURVEY.md C2-C5)."""

from disconet_tpu.data.schema import (  # noqa: F401
    FRAME_KEYS,
    save_frame,
    load_frame,
    frame_dir,
)
from disconet_tpu.data.targets import assign_targets  # noqa: F401
from disconet_tpu.data.synthetic import generate_dataset, generate_scene  # noqa: F401
from disconet_tpu.data.dataset import V2XSimDet, V2XSimSeg, collate_det, BatchIterator  # noqa: F401
