"""Pallas TPU kernels for the hot ops (SURVEY.md C6/C8 rebuild notes)."""
