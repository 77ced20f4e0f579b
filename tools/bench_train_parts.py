#!/usr/bin/env python
"""Device-time attribution WITHIN the training step (SURVEY.md §5.2 aid).

bench_train.py splits host / transfer / device; this splits the device step
itself: forward (loss value only), forward+backward (value_and_grad), and the
full train_step (grads + Adam + BN-stat replace). Each phase is its own jitted
graph timed FIFO-style with a checksum fetch (CLAUDE.md: block_until_ready
returns before remote execution finishes over the tunnel).

Usage: python tools/bench_train_parts.py --data /tmp/v2x_train256/train
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from disconet_tpu.utils.env import setup as _env_setup

_env_setup()

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", type=str, required=True)
    p.add_argument("--com", type=str, default="disco")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--grid", type=int, default=256)
    p.add_argument("--steps", type=int, default=10)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from disconet_tpu.config import Config, tiny_config
    from disconet_tpu.data import BatchIterator, V2XSimDet
    from disconet_tpu.models import build_model
    from disconet_tpu.training import batch_to_device, create_train_state, make_train_step
    from disconet_tpu.training.det_module import _losses, get_bev

    cfg = Config() if args.grid == 256 else tiny_config(args.grid)
    dataset = V2XSimDet(args.data, cfg, rsu=True, dense_targets=False, cache_items=64)
    loader = BatchIterator(dataset, args.batch, shuffle=True, seed=0, num_workers=0)
    host_batch = next(iter(loader))
    batch = batch_to_device(host_batch)
    jax.block_until_ready(batch)

    model = build_model(args.com, cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), host_batch)
    state = jax.device_put(state)

    def loss_fn(params, batch_stats, batch):
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            get_bev(batch, "bev", cfg),
            batch["trans"],
            batch["agent_mask"],
            train=True,
            mutable=["batch_stats"],
        )
        loss, metrics = _losses(out, batch, cfg)
        return loss, (metrics, mutated["batch_stats"])

    fwd = jax.jit(lambda p, bs, b: loss_fn(p, bs, b)[0])

    def _vgrad(p, bs, b):
        # keep grads live via a reduction — returning loss alone lets XLA
        # dead-code-eliminate the entire backward pass
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, bs, b)
        import optax

        return loss + 0.0 * optax.global_norm(grads)

    vgrad = jax.jit(_vgrad)
    full = make_train_step(model, cfg)

    def timeit(name, fn):
        out = fn()  # compile
        jax.block_until_ready(out)
        # checksum fetch to force remote completion across the tunnel
        float(jnp.asarray(out).sum()) if not isinstance(out, tuple) else None
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = fn()
        if isinstance(out, tuple):
            float(out[1]["loss"])
        else:
            float(out)
        dt = (time.perf_counter() - t0) / args.steps * 1000
        print(f"{name:>18}: {dt:8.2f} ms/batch")
        return dt

    t_fwd = timeit("forward(loss)", lambda: fwd(state.params, state.batch_stats, batch))
    t_bwd = timeit("value_and_grad", lambda: vgrad(state.params, state.batch_stats, batch))

    # full step donates its state argument, so put a fresh device copy and
    # thread the updated state through the timing loop
    state0 = jax.tree.map(np.asarray, state)
    s = jax.device_put(state0)
    out = full(s, batch)
    s, m = out
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(args.steps):
        s, m = full(s, batch)
    float(m["loss"])
    t_full = (time.perf_counter() - t0) / args.steps * 1000
    print(f"{'full train_step':>18}: {t_full:8.2f} ms/batch")

    print(
        json.dumps(
            {
                "batch": args.batch,
                "com": args.com,
                "fwd_ms": round(t_fwd, 2),
                "vgrad_ms": round(t_bwd, 2),
                "full_ms": round(t_full, 2),
                "bwd_minus_fwd_ms": round(t_bwd - t_fwd, 2),
                "opt_overhead_ms": round(t_full - t_bwd, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
