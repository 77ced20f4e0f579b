"""Profiling / tracing harness (SURVEY.md §5.2).

The reference has no profiling beyond wall-clock AverageMeter prints. The
rebuild certifies the scenes/sec/chip north star with real device traces:

  * :func:`trace` — context manager around ``jax.profiler`` writing a
    TensorBoard-profile-plugin trace (view with
    ``tensorboard --logdir <dir>``; the profile plugin is installed).
  * :func:`annotate` — named ``TraceAnnotation`` so voxelize / fuse / detect
    phases are identifiable in the trace viewer.
  * :func:`enable_nan_checks` — SURVEY.md §5.3: the nearest TPU analog of a
    sanitizer; turns on ``jax_debug_nans`` for CI smoke runs.

Wired to ``train_codet.py --profile <steps>``: traces that many steps of the
steady-state loop (skipping compile) into ``{logpath}/profile``.
"""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def trace(logdir: str):
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region: ``with annotate('fuse'): ...``"""
    import jax

    return jax.profiler.TraceAnnotation(name)


def enable_nan_checks() -> None:
    import jax

    jax.config.update("jax_debug_nans", True)
