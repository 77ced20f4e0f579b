"""Pallas voxelizer parity tests (SURVEY.md C6): interpret-mode kernel vs the
numpy oracle, bit-for-bit (float32 index-arithmetic contract)."""

import numpy as np
import jax.numpy as jnp
import pytest

from disconet_tpu.ops.voxelize import voxelize_occupy_jax, voxelize_occupy_np
from disconet_tpu.ops.pallas.voxelize_pallas import voxelize_occupy_pallas

VS = (0.25, 0.25, 0.4)
EXT = ((-8.0, 8.0), (-8.0, 8.0), (-3.0, 2.0))


def test_pallas_matches_oracle_single():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-9, 9, (3000, 3)).astype(np.float32)
    pts[5] = np.nan  # non-finite row must be dropped
    pts[6] = [8.0, 0.0, 0.0]  # exactly on the upper extent: dropped (x < hi)
    pts[7] = [-8.0, 0.0, -3.0]  # exactly on the lower corner: kept
    oracle = voxelize_occupy_np(pts, VS, EXT)
    out = np.asarray(voxelize_occupy_pallas(jnp.asarray(pts), VS, EXT, interpret=True))
    np.testing.assert_array_equal(oracle, out)
    assert oracle[0, 32, 0] == 1.0  # the lower-corner point landed


def test_pallas_matches_oracle_batched_and_masked():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-9, 9, (2, 2, 512, 3)).astype(np.float32)
    mask = rng.random((2, 2, 512)) < 0.7
    out = np.asarray(
        voxelize_occupy_pallas(jnp.asarray(pts), VS, EXT, mask=jnp.asarray(mask), interpret=True)
    )
    for i in range(2):
        for j in range(2):
            oracle = voxelize_occupy_np(pts[i, j][mask[i, j]], VS, EXT)
            np.testing.assert_array_equal(oracle, out[i, j], err_msg=f"frame {i},{j}")


def test_xla_scatter_matches_oracle():
    rng = np.random.default_rng(2)
    pts = rng.uniform(-9, 9, (4000, 3)).astype(np.float32)
    oracle = voxelize_occupy_np(pts, VS, EXT)
    out = np.asarray(voxelize_occupy_jax(jnp.asarray(pts), VS, EXT))
    np.testing.assert_array_equal(oracle, out)


def test_dispatcher_pallas_impl():
    from disconet_tpu.ops.voxelize import voxelize_occupy

    pts = np.array([[0.0, 0.0, 0.0], [100.0, 0.0, 0.0]], np.float32)
    # CPU backend: interpret mode required; exercise the dispatcher arg wiring
    out = voxelize_occupy_pallas(jnp.asarray(pts), VS, EXT, interpret=True)
    ref = voxelize_occupy(pts, VS, EXT, impl="np")
    np.testing.assert_array_equal(np.asarray(out), ref)


class TestPallasIoU:
    """Pallas rotated-IoU kernel (ops/pallas/rotated_iou_pallas.py) vs oracle."""

    def test_matches_oracle(self):
        from disconet_tpu.ops.rotated_iou import rotated_iou_np
        from disconet_tpu.ops.pallas.rotated_iou_pallas import rotated_iou_matrix_pallas

        rng = np.random.default_rng(3)
        N = 50
        ba = np.stack(
            [rng.uniform(-10, 10, N), rng.uniform(-10, 10, N),
             rng.uniform(0.5, 4, N), rng.uniform(0.5, 5, N),
             rng.uniform(-np.pi, np.pi, N)], 1,
        ).astype(np.float32)
        got = np.asarray(rotated_iou_matrix_pallas(jnp.asarray(ba), jnp.asarray(ba), interpret=True))
        ref = rotated_iou_np(ba, ba)
        np.testing.assert_allclose(got, ref, atol=2e-3)
        np.testing.assert_allclose(np.diag(got), 1.0, atol=1e-4)

    def test_batched_and_padded(self):
        from disconet_tpu.ops.rotated_iou import rotated_iou_np
        from disconet_tpu.ops.pallas.rotated_iou_pallas import rotated_iou_matrix_pallas

        rng = np.random.default_rng(4)
        B, N, M = 2, 7, 11  # exercises padding to the 128 block
        ba = np.stack([rng.uniform(-10, 10, (B, N)), rng.uniform(-10, 10, (B, N)),
                       rng.uniform(0.5, 4, (B, N)), rng.uniform(0.5, 5, (B, N)),
                       rng.uniform(-np.pi, np.pi, (B, N))], -1).astype(np.float32)
        bb = np.stack([rng.uniform(-10, 10, (B, M)), rng.uniform(-10, 10, (B, M)),
                       rng.uniform(0.5, 4, (B, M)), rng.uniform(0.5, 5, (B, M)),
                       rng.uniform(-np.pi, np.pi, (B, M))], -1).astype(np.float32)
        got = np.asarray(rotated_iou_matrix_pallas(jnp.asarray(ba), jnp.asarray(bb), interpret=True))
        assert got.shape == (B, N, M)
        for b in range(B):
            np.testing.assert_allclose(got[b], rotated_iou_np(ba[b], bb[b]), atol=2e-3)

