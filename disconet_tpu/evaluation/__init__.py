"""Host-side evaluation (SURVEY.md C10, C26): mAP and CLEAR-MOT metrics."""

from disconet_tpu.evaluation.mean_ap import eval_map, tpfp_default, average_precision  # noqa: F401
