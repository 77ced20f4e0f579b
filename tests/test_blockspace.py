"""Block-space conv rewrites (ops/blockspace.py): exactness vs plain convs.

The rewrites claim bit-level equivalence up to float summation order; all
checks run in f32 with tight tolerances against lax/flax natural-layout convs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from disconet_tpu.ops.blockspace import (
    conv_block_s1,
    conv_block_s2,
    depth_to_space,
    s2d_np,
    space_to_depth,
)


@pytest.fixture
def rng():
    return np.random.default_rng(31)


def _conv(x, w, stride):
    # the backbone's convention: explicit k//2 padding = torch Conv2d(p=1).
    # Equals XLA SAME at stride 1; at stride 2 SAME would read taps 2p..2p+2
    # instead of torch's 2p-1..2p+1 (see test_natural_conv_matches_torch)
    p = w.shape[0] // 2
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((p, p), (p, p)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


@pytest.mark.parametrize("stride", [1, 2])
def test_natural_conv_matches_torch(rng, stride):
    """The padding contract: the backbone's conv == torch Conv2d(k=3, p=1)
    bit-convention-for-bit — reference .pth forward parity depends on it."""
    import torch

    x = rng.standard_normal((2, 16, 16, 7)).astype(np.float32)
    w = (rng.standard_normal((3, 3, 7, 5)) * 0.1).astype(np.float32)
    got = np.asarray(_conv(jnp.asarray(x), jnp.asarray(w), stride))
    want = torch.nn.functional.conv2d(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(w).permute(3, 2, 0, 1),
        stride=stride,
        padding=1,
    ).permute(0, 2, 3, 1).numpy()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_s2d_d2s_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 5)).astype(np.float32))
    xb = space_to_depth(x)
    assert xb.shape == (2, 4, 4, 20)
    np.testing.assert_array_equal(np.asarray(depth_to_space(xb)), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(xb), s2d_np(np.asarray(x)))


def test_s2d_tile_order(rng):
    # channel index = (dy*2 + dx)*C + c
    x = np.zeros((1, 4, 4, 1), np.float32)
    x[0, 1, 2, 0] = 7.0  # block (0, 1), offsets dy=1 dx=0 -> tile 2
    xb = s2d_np(x)
    assert xb[0, 0, 1, 2] == 7.0 and xb.sum() == 7.0


def test_block_conv_s1_matches_natural(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 7)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 7, 5)).astype(np.float32) * 0.1)
    want = _conv(x, w, 1)
    got = depth_to_space(conv_block_s1(space_to_depth(x), w))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_block_conv_s2_matches_natural(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 7)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 7, 5)).astype(np.float32) * 0.1)
    want = _conv(x, w, 2)  # (2, 8, 8, 5)
    got = conv_block_s2(space_to_depth(x), w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_block_conv_s1_boundary_zeros(rng):
    # SAME zero padding must behave identically at the image border
    x = jnp.asarray(np.ones((1, 6, 6, 1), np.float32))
    w = jnp.asarray(np.ones((3, 3, 1, 1), np.float32))
    want = _conv(x, w, 1)
    got = depth_to_space(conv_block_s1(space_to_depth(x), w))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_stpn_block_vs_natural_same_params(rng):
    """Full STPN forward: block_space=True == False with identical params."""
    from disconet_tpu.models.backbone import STPN

    kw = dict(channels=(8, 12, 16), head_channels=8, dtype="float32")
    nat = STPN(**kw, block_space=False)
    blk = STPN(**kw, block_space=True)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 5)).astype(np.float32))
    variables = nat.init(jax.random.PRNGKey(0), x)
    v2 = blk.init(jax.random.PRNGKey(0), x)
    jax.tree_util.tree_map(lambda a, b: np.testing.assert_array_equal(a, b), variables, v2)

    out_n, kd_n = nat.apply(variables, x, False)
    out_b, kd_b = blk.apply(variables, x, False)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_n), atol=3e-5)
    for fn, fb in zip(kd_n, kd_b):
        np.testing.assert_allclose(np.asarray(fb), np.asarray(fn), atol=3e-5)


def test_stpn_block_batchnorm_stats_match(rng):
    """Train-mode BN statistics in block space == natural statistics."""
    from disconet_tpu.models.backbone import STPN

    kw = dict(channels=(8, 12, 16), head_channels=8, dtype="float32")
    nat = STPN(**kw, block_space=False)
    blk = STPN(**kw, block_space=True)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 5)).astype(np.float32))
    variables = nat.init(jax.random.PRNGKey(0), x)

    _, m_n = nat.apply(variables, x, True, mutable=["batch_stats"])
    _, m_b = blk.apply(variables, x, True, mutable=["batch_stats"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5),
        m_n["batch_stats"], m_b["batch_stats"],
    )


def test_disconet_block_vs_natural(rng):
    """Flagship DiscoNet forward equivalence across layouts (f32)."""
    import dataclasses

    from disconet_tpu.config import tiny_config
    from disconet_tpu.models import build_model

    cfg_n = tiny_config(
        16,
        compute_dtype="float32",
        head_raw_dtype="float32",
        block_space=False,
        block_out=False,  # config default is True; the natural side must be natural
    )
    cfg_b = dataclasses.replace(cfg_n, block_space=True)
    A = cfg_n.max_agents
    bev = rng.random((1, A, 16, 16, cfg_n.grid_size[2])).astype(np.float32)
    trans = np.tile(np.eye(4, dtype=np.float32), (1, A, A, 1, 1))
    mask = np.ones((1, A), bool)
    mask[0, -2:] = False

    m_n = build_model("disco", cfg_n)
    m_b = build_model("disco", cfg_b)
    variables = m_n.init(jax.random.PRNGKey(1), jnp.asarray(bev), jnp.asarray(trans), jnp.asarray(mask))
    out_n = m_n.apply(variables, jnp.asarray(bev), jnp.asarray(trans), jnp.asarray(mask))
    out_b = m_b.apply(variables, jnp.asarray(bev), jnp.asarray(trans), jnp.asarray(mask))
    for k in ("cls", "reg", "head_raw"):
        np.testing.assert_allclose(np.asarray(out_b[k]), np.asarray(out_n[k]), atol=5e-5)


# ---- block-OUT rewrite (natural input -> block output, stride-2 4x4) ----


def test_conv_block_out_matches_natural(rng):
    from disconet_tpu.ops.blockspace import conv_block_out

    x = jnp.asarray(rng.standard_normal((2, 16, 16, 7)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 7, 5)).astype(np.float32) * 0.1)
    want = _conv(x, w, 1)
    got = depth_to_space(conv_block_out(x, w))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_conv_up_block_out_matches_natural(rng):
    from disconet_tpu.models.backbone import upsample2x
    from disconet_tpu.ops.blockspace import conv_up_block_out

    x_lo = jnp.asarray(rng.standard_normal((2, 8, 8, 6)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 6, 5)).astype(np.float32) * 0.1)
    want = _conv(upsample2x(x_lo), w, 1)  # (2, 16, 16, 5)
    got = depth_to_space(conv_up_block_out(x_lo, w))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_stpn_block_out_vs_natural_same_params(rng):
    """Full STPN forward (+ train-mode BN stats): block_out == natural."""
    from disconet_tpu.models.backbone import STPN

    kw = dict(channels=(8, 12, 16), head_channels=8, dtype="float32")
    nat = STPN(**kw, block_out=False)
    # block_out_encoder: measured slower e2e (backbone.py note) but must stay
    # exact — exercise it together with the decoder rewrite
    blk = STPN(**kw, block_out=True, block_out_encoder=True)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 5)).astype(np.float32))
    variables = nat.init(jax.random.PRNGKey(0), x)
    v2 = blk.init(jax.random.PRNGKey(0), x)
    jax.tree_util.tree_map(lambda a, b: np.testing.assert_array_equal(a, b), variables, v2)

    out_n, kd_n = nat.apply(variables, x, False)
    out_b, kd_b = blk.apply(variables, x, False)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_n), atol=3e-5)
    for fn, fb in zip(kd_n, kd_b):
        np.testing.assert_allclose(np.asarray(fb), np.asarray(fn), atol=3e-5)

    _, m_n = nat.apply(variables, x, True, mutable=["batch_stats"])
    _, m_b = blk.apply(variables, x, True, mutable=["batch_stats"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5),
        m_n["batch_stats"], m_b["batch_stats"],
    )


def test_disconet_block_out_vs_natural(rng):
    """Flagship DiscoNet forward equivalence with block_out (f32), incl. at
    fusion layer 0 where block_space is structurally disabled."""
    import dataclasses

    from disconet_tpu.config import tiny_config
    from disconet_tpu.models import build_model

    for layer in (3, 0):
        cfg_n = tiny_config(
            16,
            compute_dtype="float32",
            head_raw_dtype="float32",
            fusion_layer=layer,
            block_out=False,  # config default is True; pin the natural baseline
        )
        # dec1 block-OUT shares the dispatch: exercise it together with dec0
        cfg_b = dataclasses.replace(cfg_n, block_out=True, block_out_dec1=True)
        A = cfg_n.max_agents
        bev = rng.random((1, A, 16, 16, cfg_n.grid_size[2])).astype(np.float32)
        trans = np.tile(np.eye(4, dtype=np.float32), (1, A, A, 1, 1))
        mask = np.ones((1, A), bool)
        mask[0, -2:] = False

        m_n = build_model("disco", cfg_n, layer=layer)
        m_b = build_model("disco", cfg_b, layer=layer)
        variables = m_n.init(
            jax.random.PRNGKey(1), jnp.asarray(bev), jnp.asarray(trans), jnp.asarray(mask)
        )
        out_n = m_n.apply(variables, jnp.asarray(bev), jnp.asarray(trans), jnp.asarray(mask))
        out_b = m_b.apply(variables, jnp.asarray(bev), jnp.asarray(trans), jnp.asarray(mask))
        for k in ("cls", "reg", "head_raw"):
            np.testing.assert_allclose(
                np.asarray(out_b[k]), np.asarray(out_n[k]), atol=5e-5
            )
