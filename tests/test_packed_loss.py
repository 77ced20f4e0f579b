"""Parity tests for the packed det-loss path (ops/losses.py packed_det_losses).

The packed path computes focal cls + masked smooth-L1 reg straight from
DetectionHeads' packed fp32 tensor (dense background pass + sparse correction
at the positive sites) and must equal the view-based path — values AND
gradients — for binary and multi-class targets, with padded agents and
sentinel positives. The views are produced by the REAL DetectionHeads module
so the lane-layout contract (class-major cls, anchor-major reg) cannot drift
from what the loss assumes.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from disconet_tpu.config import tiny_config
from disconet_tpu.models.backbone import DetectionHeads
from disconet_tpu.training.det_module import _losses

B, A, H, W, NA, CODE, P = 2, 3, 8, 8, 6, 6, 16
N_FLAT = H * W * NA


def _cfg(num_classes=2, **kw):
    return dataclasses.replace(tiny_config(64), num_classes=num_classes, **kw)


def _setup(num_classes, seed=0):
    rng = np.random.RandomState(seed)
    heads = DetectionHeads(
        num_anchors=NA, num_classes=num_classes, box_code_size=CODE
    )
    head_in = jnp.asarray(rng.randn(B * A, H, W, 32).astype(np.float32))
    params = heads.init(jax.random.PRNGKey(seed), head_in)["params"]

    idx = np.full((B, A, P), N_FLAT, np.int32)  # sentinel-padded
    n_pos = rng.randint(1, P, size=(B, A))
    for b in range(B):
        for a in range(A):
            idx[b, a, : n_pos[b, a]] = rng.choice(
                N_FLAT, size=n_pos[b, a], replace=False
            )
    batch = {
        "agent_mask": jnp.asarray([[1, 1, 0], [1, 1, 1]], np.bool_),
        "reg_pos_idx": jnp.asarray(idx),
        "reg_pos_target": jnp.asarray(
            rng.randn(B, A, P, CODE).astype(np.float32)
        ),
    }
    if num_classes > 2:
        batch["reg_pos_cls"] = jnp.asarray(
            rng.randint(1, num_classes, size=(B, A, P)).astype(np.int32)
        )
    return heads, params, head_in, batch


def _loss_fns(heads, batch, cfg, packed):
    def fn(params, head_in):
        cls, reg, _, raw32 = heads.apply({"params": params}, head_in)
        out = {
            "cls": cls.reshape((B, A) + cls.shape[1:]),
            "reg": reg.reshape((B, A) + reg.shape[1:]),
        }
        if packed:
            out["head_raw_f32"] = raw32.reshape((B, A) + raw32.shape[1:])
        loss, metrics = _losses(out, batch, cfg)
        return loss, metrics

    return fn


@pytest.mark.parametrize("num_classes", [2, 4])
def test_packed_loss_matches_view_path(num_classes):
    heads, params, head_in, batch = _setup(num_classes)
    cfg = _cfg(num_classes)

    view_fn = _loss_fns(heads, batch, cfg, packed=False)
    packed_fn = _loss_fns(heads, batch, cfg, packed=True)

    (lv, mv), gv = jax.value_and_grad(view_fn, argnums=1, has_aux=True)(
        params, head_in
    )
    (lp, mp), gp = jax.value_and_grad(packed_fn, argnums=1, has_aux=True)(
        params, head_in
    )

    np.testing.assert_allclose(lp, lv, rtol=2e-5)
    for k in ("cls_loss", "reg_loss"):
        np.testing.assert_allclose(mp[k], mv[k], rtol=2e-5, err_msg=k)
    np.testing.assert_allclose(gp, gv, rtol=5e-4, atol=1e-6)


def test_packed_loss_flag_off_uses_view_path():
    """config.packed_loss=False must route through the view path even when
    head_raw_f32 is present (the oracle escape hatch)."""
    heads, params, head_in, batch = _setup(2)
    cfg = _cfg(2, packed_loss=False)
    lp, _ = _loss_fns(heads, batch, cfg, packed=True)(params, head_in)
    lv, _ = _loss_fns(heads, batch, cfg, packed=False)(params, head_in)
    assert float(lp) == float(lv)


def test_packed_loss_all_sentinel_positives():
    """A frame with zero positives (all-sentinel row) must not NaN and must
    match the view path (the view path's scatter drops sentinels)."""
    heads, params, head_in, batch = _setup(2, seed=1)
    batch["reg_pos_idx"] = jnp.full((B, A, P), N_FLAT, jnp.int32)
    cfg = _cfg(2)
    lv, mv = _loss_fns(heads, batch, cfg, packed=False)(params, head_in)
    lp, mp = _loss_fns(heads, batch, cfg, packed=True)(params, head_in)
    assert np.isfinite(float(lp))
    np.testing.assert_allclose(lp, lv, rtol=2e-5)
    np.testing.assert_allclose(mp["reg_loss"], mv["reg_loss"], rtol=2e-5)
