"""Warp parity vs torch CPU (SURVEY.md §7 hard parts: grid_sample conventions)."""

import numpy as np
import pytest

import jax.numpy as jnp

from disconet_tpu.ops.warp import affine_grid, grid_sample, pose_to_affine, warp_features

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _rand_theta(rng, n):
    ang = rng.uniform(-np.pi, np.pi, size=n)
    theta = np.zeros((n, 2, 3), dtype=np.float32)
    theta[:, 0, 0] = np.cos(ang)
    theta[:, 0, 1] = -np.sin(ang)
    theta[:, 1, 0] = np.sin(ang)
    theta[:, 1, 1] = np.cos(ang)
    theta[:, :, 2] = rng.uniform(-0.5, 0.5, size=(n, 2))
    return theta


class TestTorchParity:
    @pytest.mark.parametrize("align", [False, True])
    def test_affine_grid(self, align):
        rng = np.random.default_rng(0)
        theta = _rand_theta(rng, 3)
        size = (3, 4, 16, 24)
        want = F.affine_grid(torch.from_numpy(theta), size, align_corners=align).numpy()
        got = np.asarray(affine_grid(jnp.asarray(theta), size, align_corners=align))
        np.testing.assert_allclose(got, want, atol=1e-5)

    @pytest.mark.parametrize("align", [False, True])
    def test_grid_sample(self, align):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 3, 20, 28)).astype(np.float32)
        theta = _rand_theta(rng, 2)
        grid_t = F.affine_grid(torch.from_numpy(theta), x.shape, align_corners=align)
        want = F.grid_sample(
            torch.from_numpy(x), grid_t, mode="bilinear",
            padding_mode="zeros", align_corners=align,
        ).numpy()
        grid_j = affine_grid(jnp.asarray(theta), x.shape, align_corners=align)
        got = np.asarray(grid_sample(jnp.asarray(x), grid_j, align_corners=align))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_grid_sample_out_of_bounds_zero(self):
        x = np.ones((1, 1, 8, 8), dtype=np.float32)
        # pure translation far out of bounds
        theta = np.array([[[1.0, 0.0, 5.0], [0.0, 1.0, 5.0]]], dtype=np.float32)
        grid_j = affine_grid(jnp.asarray(theta), x.shape)
        got = np.asarray(grid_sample(jnp.asarray(x), grid_j))
        assert got.max() == 0.0


class TestWarpFeatures:
    EXT = ((-8.0, 8.0), (-8.0, 8.0))

    def _identity_pose(self, a):
        t = np.zeros((a, a, 4, 4), dtype=np.float32)
        t[..., np.arange(4), np.arange(4)] = 1.0
        return t

    def test_identity(self):
        rng = np.random.default_rng(2)
        feats = rng.normal(size=(3, 32, 32, 4)).astype(np.float32)
        trans = self._identity_pose(3)
        out = np.asarray(warp_features(jnp.asarray(feats), jnp.asarray(trans), self.EXT))
        assert out.shape == (3, 3, 32, 32, 4)
        for i in range(3):
            for j in range(3):
                np.testing.assert_allclose(out[i, j], feats[j], atol=1e-5)

    def test_translation_shifts_cells(self):
        # sender j is 2 cells (1.0 m at 0.5 m/cell) ahead of receiver i in +x:
        # p_i = p_j + [1, 0] => sender content appears shifted by +2 cells in x.
        feats = np.zeros((2, 32, 32, 1), dtype=np.float32)
        feats[1, 10, 10, 0] = 1.0
        trans = self._identity_pose(2)
        trans[0, 1, 0, 3] = 1.0  # sender 1 -> receiver 0: +1 m in x
        out = np.asarray(warp_features(jnp.asarray(feats), jnp.asarray(trans), self.EXT))
        np.testing.assert_allclose(out[0, 1, 12, 10, 0], 1.0, atol=1e-5)
        assert out[0, 1, 10, 10, 0] < 1e-5

    def test_rotation_90(self):
        # 90 deg rotation about origin: p_i = R p_j with R = [[0,-1],[1,0]].
        # metric point (x, y) in sender shows up at (-y, x) in receiver.
        feats = np.zeros((2, 32, 32, 1), dtype=np.float32)
        # cell (20, 16) center = (x=+2.25, y=+0.25)@0.5m cells, lo=-8: x=-8+20.5*.5
        feats[1, 20, 16, 0] = 1.0
        trans = self._identity_pose(2)
        trans[0, 1, :2, :2] = np.array([[0.0, -1.0], [1.0, 0.0]])
        out = np.asarray(warp_features(jnp.asarray(feats), jnp.asarray(trans), self.EXT))
        # sender metric (2.25, 0.25) -> receiver metric (-0.25, 2.25)
        # receiver cell: x: (-0.25+8)/0.5-0.5 = 15.0, y: (2.25+8)/0.5-0.5 = 20.0
        np.testing.assert_allclose(out[0, 1, 15, 20, 0], 1.0, atol=1e-4)

    def test_round_trip_inverse(self):
        rng = np.random.default_rng(3)
        ang = 0.7
        T = np.eye(4, dtype=np.float32)
        T[:2, :2] = [[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]]
        T[0, 3], T[1, 3] = 1.5, -0.75
        aff = np.asarray(pose_to_affine(jnp.asarray(T)))
        # aff maps receiver->sender; composing with T's own xy block ~ identity
        R = T[:2, :2]
        t = T[:2, 3]
        comp_R = R @ aff[:, :2]
        comp_t = R @ aff[:, 2] + t
        np.testing.assert_allclose(comp_R, np.eye(2), atol=1e-5)
        np.testing.assert_allclose(comp_t, np.zeros(2), atol=1e-5)


class TestMatmulWarp:
    """warp_features_matmul (MXU formulation) vs the gather reference."""

    def test_matches_gather_f32(self):
        import numpy as np
        from disconet_tpu.ops.warp import warp_features, warp_features_matmul

        rng = np.random.default_rng(0)
        A, H, C = 3, 16, 8
        feats = jnp.asarray(rng.standard_normal((A, H, H, C)).astype(np.float32))
        trans = np.tile(np.eye(4, dtype=np.float32), (A, A, 1, 1))
        for i in range(A):
            for j in range(A):
                th = rng.uniform(-np.pi, np.pi)
                c, s = np.cos(th), np.sin(th)
                trans[i, j][:2, :2] = [[c, -s], [s, c]]
                trans[i, j][:2, 3] = rng.uniform(-2, 2, 2)
        ext = ((-4.0, 4.0), (-4.0, 4.0))
        g = np.asarray(warp_features(feats, jnp.asarray(trans), ext))
        m = np.asarray(warp_features_matmul(feats, jnp.asarray(trans), ext))
        # CPU f32 matmul: near-exact agreement with the gather formulation
        np.testing.assert_allclose(g, m, atol=5e-5)

    def test_identity_pose_is_exact(self):
        import numpy as np
        from disconet_tpu.ops.warp import warp_features_matmul

        rng = np.random.default_rng(1)
        A, H, C = 2, 8, 4
        feats = jnp.asarray(rng.standard_normal((A, H, H, C)).astype(np.float32))
        trans = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (A, A, 1, 1)))
        out = np.asarray(warp_features_matmul(feats, trans, ((-1.0, 1.0), (-1.0, 1.0))))
        for i in range(A):
            np.testing.assert_allclose(out[i, i], np.asarray(feats[i]), atol=1e-6)

    def test_warp_all_pairs_dispatches_to_gather_on_large_grids(self, monkeypatch):
        """Fusion grids with H*W > 1024 must use the O(Q) gather warp — the
        one-hot matmul's dense (A, A, Q, Q) tap matrix is infeasible there
        (2.4 GB/scene at Q=4096, i.e. --layer 2 at the 256^2 geometry)."""
        import jax
        import numpy as np
        import disconet_tpu.models.base as base

        rng = np.random.default_rng(2)
        B, A, H, C = 1, 2, 36, 2  # Q = 1296 > 1024
        feats = jnp.asarray(rng.standard_normal((B, A, H, H, C)).astype(np.float32))
        trans = np.tile(np.eye(4, dtype=np.float32), (B, A, A, 1, 1))
        trans[0, 0, 1][:2, 3] = [0.5, -0.25]
        trans[0, 1, 0][:2, 3] = [-0.5, 0.25]
        ext = ((-4.0, 4.0), (-4.0, 4.0))

        def boom(*a, **k):
            raise AssertionError("matmul warp must not run at Q > 1024")

        monkeypatch.setattr(base, "warp_features_matmul", boom)
        got = np.asarray(base.warp_all_pairs(feats, jnp.asarray(trans), ext))
        from disconet_tpu.ops.warp import warp_features

        want = np.asarray(
            jax.vmap(lambda f, t: warp_features(f, t, ext))(feats, jnp.asarray(trans))
        )
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_warp_matmul_bf16_close_to_f32(self):
        """config.warp_dtype='bfloat16' (models/base.py, TPU dispatch) runs the
        one-hot matmul warp on bf16 feats/taps with f32 accumulation. Against
        the f32 path the error budget is bf16 feature rounding (~0.4%) plus
        the ~4e-3 tap-weight quantization (ops/warp.py docstring)."""
        import numpy as np
        from disconet_tpu.ops.warp import warp_features_matmul

        rng = np.random.default_rng(3)
        A, H, C = 3, 16, 8
        feats = rng.standard_normal((A, H, H, C)).astype(np.float32)
        trans = np.tile(np.eye(4, dtype=np.float32), (A, A, 1, 1))
        for i in range(A):
            for j in range(A):
                th = 0.3 * (i - j)
                trans[i, j][:2, :2] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
                trans[i, j][:2, 3] = [0.25 * (i + 1), -0.2 * (j + 1)]
        ext = ((-2.0, 2.0), (-2.0, 2.0))
        f32 = np.asarray(warp_features_matmul(jnp.asarray(feats), jnp.asarray(trans), ext))
        bf16 = np.asarray(
            warp_features_matmul(
                jnp.asarray(feats, dtype=jnp.bfloat16), jnp.asarray(trans), ext
            ),
            dtype=np.float32,
        )
        scale = np.abs(f32).max()
        assert np.max(np.abs(bf16 - f32)) < 0.02 * scale
