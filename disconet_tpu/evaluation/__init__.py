"""Host-side evaluation (SURVEY.md C10, C26): mAP and CLEAR-MOT metrics."""

from disconet_tpu.evaluation.mean_ap import (  # noqa: F401
    average_precision,
    eval_map,
    eval_map_multiclass,
    tpfp_default,
)
