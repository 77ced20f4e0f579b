"""Model zoo tests (SURVEY.md §5.1): shapes for every --com variant, padding
leak-freedom of the sender softmax, KD feature taps, seg task heads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from disconet_tpu.config import tiny_config
from disconet_tpu.models import build_model
from disconet_tpu.models.base import sender_softmax, masked_sender_reduce

CFG = tiny_config(32)
B, A = 1, 4
H, W, Z = CFG.bev_shape


def _inputs(rng_seed=0, agents_present=3):
    rng = np.random.default_rng(rng_seed)
    bev = (rng.random((B, A, H, W, Z)) < 0.02).astype(np.float32)
    trans = np.tile(np.eye(4, dtype=np.float32), (B, A, A, 1, 1))
    mask = np.zeros((B, A), bool)
    mask[:, :agents_present] = True
    bev[:, agents_present:] = 0.0
    return jnp.asarray(bev), jnp.asarray(trans), jnp.asarray(mask)


@pytest.mark.parametrize("com", ["", "disco", "sum", "mean", "max", "cat", "agent", "v2v", "when2com", "who2com"])
def test_forward_shapes(com):
    bev, trans, mask = _inputs()
    model = build_model(com, CFG)
    variables = model.init(jax.random.PRNGKey(0), bev, trans, mask, train=False)
    out = model.apply(variables, bev, trans, mask, train=False)
    assert out["cls"].shape == (B, A, H, W, CFG.num_anchors, CFG.num_classes)
    assert out["reg"].shape == (B, A, H, W, CFG.num_anchors, CFG.box_code_size)
    assert np.all(np.isfinite(np.asarray(out["cls"], np.float32)))


def test_who2com_hard_select_masks_absent():
    """Who2com (SURVEY.md C17): at inference the argmax one-hot selection must
    never pick an absent sender, and warp_flag=False uses unwarped ego values
    (the reference's MIMO no-warp variant). Both run the same params."""
    bev, trans, mask = _inputs(agents_present=2)
    model = build_model("who2com", CFG, warp_flag=False)
    variables = model.init(jax.random.PRNGKey(0), bev, trans, mask, train=False)
    out = model.apply(variables, bev, trans, mask, train=False)
    assert np.all(np.isfinite(np.asarray(out["cls"], np.float32)))
    # absent receivers (padded slots) produce *some* output but are excluded
    # downstream via agent_mask; the invariant here is finiteness + shape
    assert out["cls"].shape[:2] == (B, A)


@pytest.mark.parametrize("com", ["disco", "mean", "agent"])
def test_padding_does_not_leak(com):
    """Garbage in absent-agent slots must not change present agents' outputs
    (SURVEY.md §7 'hard parts': padding must not leak into the sender softmax)."""
    bev, trans, mask = _inputs(agents_present=2)
    model = build_model(com, CFG)
    variables = model.init(jax.random.PRNGKey(0), bev, trans, mask, train=False)
    out_clean = model.apply(variables, bev, trans, mask, train=False)

    poisoned = np.asarray(bev).copy()
    poisoned[:, 2:] = 1000.0  # garbage in padded slots
    out_poisoned = model.apply(variables, jnp.asarray(poisoned), trans, mask, train=False)
    np.testing.assert_allclose(
        np.asarray(out_clean["cls"][:, :2], np.float32),
        np.asarray(out_poisoned["cls"][:, :2], np.float32),
        atol=1e-4,
    )


def test_sender_softmax_masking():
    scores = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, 4, 8, 8)).astype(np.float32))
    mask = jnp.asarray([[True, True, False, False], [True, True, True, False]])
    w = sender_softmax(scores, mask)
    w = np.asarray(w)
    # absent senders get exactly zero weight
    assert np.all(w[0, :, 2:] == 0)
    assert np.all(w[1, :, 3:] == 0)
    # weights over present senders sum to 1
    np.testing.assert_allclose(w.sum(axis=2), 1.0, atol=1e-5)


def test_masked_reduce():
    rng = np.random.default_rng(1)
    warped = jnp.asarray(rng.normal(size=(1, 2, 3, 4, 4, 2)).astype(np.float32))
    mask = jnp.asarray([[True, True, False]])
    s = np.asarray(masked_sender_reduce(warped, mask, "sum"))
    np.testing.assert_allclose(s, np.asarray(warped)[:, :, :2].sum(axis=2), atol=1e-5)
    m = np.asarray(masked_sender_reduce(warped, mask, "mean"))
    np.testing.assert_allclose(m, np.asarray(warped)[:, :, :2].mean(axis=2), atol=1e-5)
    mx = np.asarray(masked_sender_reduce(warped, mask, "max"))
    np.testing.assert_allclose(mx, np.asarray(warped)[:, :, :2].max(axis=2), atol=1e-5)


def test_kd_feature_taps():
    bev, trans, mask = _inputs()
    model = build_model("disco", CFG, kd_flag=True)
    variables = model.init(jax.random.PRNGKey(0), bev, trans, mask, train=False)
    out = model.apply(variables, bev, trans, mask, train=False)
    feats = out["kd_feats"]
    assert len(feats) == 5  # 4 decoder stages + head input
    # coarse -> fine: spatial dims double each stage
    hs = [f.shape[2] for f in feats[:-1]]
    assert hs == sorted(hs)
    assert feats[-1].shape[:2] == (B, A)


def test_teacher_student_kd_shapes_match():
    bev, trans, mask = _inputs()
    student = build_model("disco", CFG, kd_flag=True)
    teacher = build_model("teacher", CFG)
    sv = student.init(jax.random.PRNGKey(0), bev, trans, mask, train=False)
    tv = teacher.init(jax.random.PRNGKey(1), bev, None, mask, train=False)
    so = student.apply(sv, bev, trans, mask, train=False)
    to = teacher.apply(tv, bev, None, mask, train=False)
    for sf, tf in zip(so["kd_feats"], to["kd_feats"]):
        assert sf.shape == tf.shape


def test_pair1x1_matches_concat_conv():
    """ConvBNRelu mode='pair1x1' (DiscoNet scorer's first layer: split-kernel
    dots, ego projected once per receiver) must match the concat formulation
    on the folded pair batch — same params, fp32 compute, near-exact (only
    f32 accumulation order differs)."""
    from disconet_tpu.models.backbone import ConvBNRelu

    rng = np.random.default_rng(0)
    N, S, h, w, C = 3, 4, 8, 8, 16
    ego = rng.normal(size=(N, h, w, C)).astype(np.float32)
    warped = rng.normal(size=(N * S, h, w, C)).astype(np.float32)
    pair_mask = jnp.asarray(rng.random(N * S) < 0.7)

    mod = ConvBNRelu(24, kernel=1, dtype="float32", masked_bn=True)
    variables = mod.init(
        jax.random.PRNGKey(0),
        (jnp.asarray(ego), jnp.asarray(warped), S),
        mode="pair1x1",
        sample_mask=pair_mask,
    )
    y_pair = mod.apply(
        variables, (jnp.asarray(ego), jnp.asarray(warped), S),
        mode="pair1x1", sample_mask=pair_mask,
    )
    concat = np.concatenate(
        [np.repeat(ego, S, axis=0), warped], axis=-1
    )  # (N*S, h, w, 2C)
    y_cat = mod.apply(
        variables, jnp.asarray(concat), mode="natural", sample_mask=pair_mask
    )
    np.testing.assert_allclose(np.asarray(y_pair), np.asarray(y_cat), atol=1e-5)


def test_bf16_warp_is_inference_only(monkeypatch):
    """config.warp_dtype='bfloat16' must apply the bf16 warp ONLY when
    train=False: training through quantized warps measured −0.11 mAP@0.7
    (models/base.py). The gate is also TPU-only, so fake the backend check
    to exercise the bf16 branch on the CPU test backend (single-device CPU
    executes the bf16 einsum fine; only the sharded DotThunk cannot)."""
    import dataclasses

    import disconet_tpu.models.base as base

    bev, trans_id, mask = _inputs()
    # non-identity poses so the warp actually resamples
    trans = np.tile(np.eye(4, dtype=np.float32), (B, A, A, 1, 1))
    th = 0.2
    for i in range(A):
        for j in range(A):
            if i != j:
                trans[:, i, j, :2, :2] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
                trans[:, i, j, :2, 3] = [0.5, -0.25]
    trans = jnp.asarray(trans)

    cfg16 = dataclasses.replace(CFG, warp_dtype="bfloat16")
    cfg32 = dataclasses.replace(CFG, warp_dtype="float32")
    m16 = build_model("disco", cfg16)
    m32 = build_model("disco", cfg32)
    variables = m32.init(jax.random.PRNGKey(0), bev, trans, mask, train=False)

    monkeypatch.setattr(base.jax, "default_backend", lambda: "tpu")
    # train=True: gate forces f32 — identical to the f32 config
    o16_t, _ = m16.apply(variables, bev, trans, mask, train=True, mutable=["batch_stats"])
    o32_t, _ = m32.apply(variables, bev, trans, mask, train=True, mutable=["batch_stats"])
    assert np.array_equal(np.asarray(o16_t["cls"]), np.asarray(o32_t["cls"]))
    # train=False: bf16 warp active — close to f32 but not bit-equal
    o16_e = m16.apply(variables, bev, trans, mask, train=False)
    o32_e = m32.apply(variables, bev, trans, mask, train=False)
    c16 = np.asarray(o16_e["cls"], np.float32)
    c32 = np.asarray(o32_e["cls"], np.float32)
    assert not np.array_equal(c16, c32)
    np.testing.assert_allclose(c16, c32, atol=0.15)


def test_head_in_dtype_bf16_det_outputs_identical():
    """config.head_in_dtype only changes the STORAGE of the head_conv output;
    the det heads matmul casts its input to compute dtype either way, so
    cls/reg/head_raw must be bit-identical between fp32 and bf16 storage
    (the knob is a pure HBM-bandwidth optimization for the det path)."""
    import dataclasses

    bev, trans, mask = _inputs()
    cfg32 = dataclasses.replace(CFG, head_in_dtype="float32")
    cfg16 = dataclasses.replace(CFG, head_in_dtype="bfloat16")
    m32 = build_model("disco", cfg32)
    m16 = build_model("disco", cfg16)
    variables = m32.init(jax.random.PRNGKey(0), bev, trans, mask, train=False)
    # same param tree: the knob is runtime-only, checkpoints are shared
    o32 = m32.apply(variables, bev, trans, mask, train=False)
    o16 = m16.apply(variables, bev, trans, mask, train=False)
    assert np.array_equal(np.asarray(o32["cls"]), np.asarray(o16["cls"]))
    assert np.array_equal(np.asarray(o32["reg"]), np.asarray(o16["reg"]))
    assert np.array_equal(
        np.asarray(o32["head_raw"], np.float32), np.asarray(o16["head_raw"], np.float32)
    )


@pytest.mark.parametrize(
    "com,backbone",
    [("", "unet"), ("", "stpn"), ("disco", "unet"), ("disco", "stpn"),
     ("v2v", "unet"), ("mean", "unet")],
)
def test_seg_task(com, backbone):
    """Both seg backbones (SURVEY.md C19): the reference-topology UNet
    (config.seg_backbone default) and the det STPN + SegHead."""
    cfg = tiny_config(32, seg_backbone=backbone)
    bev, trans, mask = _inputs()
    model = build_model(com, cfg, task="seg")
    variables = model.init(jax.random.PRNGKey(0), bev, trans, mask, train=False)
    out = model.apply(variables, bev, trans, mask, train=False)
    assert out["seg"].shape == (B, A, H, W, cfg.num_seg_classes)
    assert np.all(np.isfinite(np.asarray(out["seg"], np.float32)))


def test_unet_structure():
    """UNet stage contract (models/unet.py): encoder features at strides
    1,2,4,8,16 with the classic 64-128-256-512-512 widths (scaled here), and
    a stride-1 head input at channels[0] — the STPN-compatible interface the
    fusion models consume."""
    from disconet_tpu.models.unet import UNet

    ch = (8, 16, 32, 64, 64)
    net = UNet(channels=ch)
    x = jnp.zeros((2, H, W, Z), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, method=UNet.encode)
    feats = net.apply(variables, x, method=UNet.encode)
    assert len(feats) == 5
    for i, f in enumerate(feats):
        assert f.shape == (2, H >> i, W >> i, ch[i]), (i, f.shape)
    variables = net.init(jax.random.PRNGKey(0), x)
    head_in, kd_feats = net.apply(variables, x)
    assert head_in.shape == (2, H, W, ch[0])
    assert len(kd_feats) == 4  # decoder outputs coarse->fine


def test_teacher_loads_fafnet_params():
    """TeacherNet is architecture-identical to FaFNet: an upperbound-trained
    FaFNet checkpoint must load into TeacherNet unchanged (SURVEY.md C14)."""
    bev, trans, mask = _inputs()
    faf = build_model("", CFG)
    teacher = build_model("teacher", CFG)
    fv = faf.init(jax.random.PRNGKey(0), bev, None, mask, train=False)
    out = teacher.apply(fv, bev, None, mask, train=False)  # params fit directly
    assert "kd_feats" in out


def test_disco_edge_weights_intermediate():
    """DiscoNet sows the per-pixel DiscoGraph weights: shape (B, Ar, As, h, w),
    softmax-normalized over present senders, exactly zero for absent ones
    (the img.png d-e heat-map data, retrieved via mutable intermediates)."""
    bev, trans, mask = _inputs(agents_present=3)
    model = build_model("disco", CFG)
    variables = model.init(jax.random.PRNGKey(0), bev, trans, mask, train=False)
    _, inter = model.apply(
        variables, bev, trans, mask, train=False, mutable=["intermediates"]
    )
    w = np.asarray(inter["intermediates"]["edge_weights"][0], np.float32)
    k = CFG.fusion_layer
    h = H >> k
    assert w.shape == (B, A, A, h, h)
    present = np.asarray(mask[0])
    # per-pixel softmax over senders: sums to 1 for present receivers
    sums = w[0, present].sum(axis=1)
    np.testing.assert_allclose(sums, np.ones_like(sums), atol=1e-5)
    # absent senders carry exactly zero weight
    assert np.all(w[0][:, ~present] == 0.0)


def test_render_edge_weights_figure(tmp_path):
    from disconet_tpu.utils.visualization import render_edge_weights

    rng = np.random.default_rng(0)
    w = rng.random((A, 8, 8)).astype(np.float32)
    mask = np.array([True, True, True, False])
    fig = render_edge_weights(w, mask, receiver=1)
    out = tmp_path / "edge.png"
    fig.savefig(str(out))
    assert out.stat().st_size > 5000


@pytest.mark.parametrize("com", ["v2v", "cat"])
def test_layer_override_channel_sync(com):
    """build_model(..., layer=k) must size fusion submodules from the actual
    layer-k feature width, not config.fusion_layer's (regression: ConvGRU /
    CatFusion projection crashed when layer != config.fusion_layer)."""
    bev, trans, mask = _inputs()
    model = build_model(com, CFG, layer=2)  # CFG.fusion_layer stays 3
    variables = model.init(jax.random.PRNGKey(0), bev, trans, mask, train=False)
    out = model.apply(variables, bev, trans, mask, train=False)
    assert out["cls"].shape == (B, A, H, W, CFG.num_anchors, CFG.num_classes)


def test_masked_batchnorm_ignores_masked_rows():
    """Stats and valid-row outputs must be invariant to garbage in masked
    rows, and must equal plain nn.BatchNorm run on just the valid subset."""
    import flax.linen as nn

    from disconet_tpu.models.backbone import MaskedBatchNorm

    rng = np.random.default_rng(0)
    x_valid = jnp.asarray(rng.standard_normal((3, 4, 4, 5)).astype(np.float32))
    garbage = jnp.asarray(1e3 * rng.standard_normal((2, 4, 4, 5)).astype(np.float32))
    x = jnp.concatenate([x_valid, garbage], axis=0)
    mask = jnp.array([True, True, True, False, False])

    mbn = MaskedBatchNorm(momentum=0.9)
    variables = mbn.init(jax.random.PRNGKey(0), x, mask)
    y, mut = mbn.apply(variables, x, mask, mutable=["batch_stats"])

    ref = nn.BatchNorm(use_running_average=False, momentum=0.9)
    rv = ref.init(jax.random.PRNGKey(0), x_valid)
    y_ref, mut_ref = ref.apply(rv, x_valid, mutable=["batch_stats"])

    np.testing.assert_allclose(np.asarray(y[:3]), np.asarray(y_ref), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["mean"]),
        np.asarray(mut_ref["batch_stats"]["mean"]), rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["var"]),
        np.asarray(mut_ref["batch_stats"]["var"]), rtol=2e-4,
    )
    # poisoning masked rows further changes nothing for valid rows/stats
    x2 = x.at[3:].mul(-7.0)
    y2, mut2 = mbn.apply(variables, x2, mask, mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(y2[:3]), np.asarray(y[:3]))
    np.testing.assert_array_equal(
        np.asarray(mut2["batch_stats"]["mean"]), np.asarray(mut["batch_stats"]["mean"])
    )


def test_masked_batchnorm_eval_uses_running_stats():
    from disconet_tpu.models.backbone import MaskedBatchNorm

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 2, 2, 3)).astype(np.float32))
    mbn = MaskedBatchNorm()
    variables = mbn.init(jax.random.PRNGKey(0), x, None)
    # eval: normalize by the (init) running stats regardless of mask
    y = mbn.apply(variables, x, jnp.array([True, False, True, False]),
                  use_running_average=True)
    np.testing.assert_allclose(  # init stats: mean 0, var 1
        np.asarray(y), np.asarray(x) / np.sqrt(1 + 1e-5), rtol=1e-6
    )


def test_v2v_gru_rounds_override():
    """--gru_rounds (the v2v stability ablation, BASELINE.md): rounds=1 must
    build with the SAME parameter tree (the ConvGRU/message conv are shared
    across rounds) but a different forward (fewer message-passing rounds), and
    the knob must reject non-v2v models."""
    bev, trans, mask = _inputs()
    m3 = build_model("v2v", CFG)
    m1 = build_model("v2v", CFG, gru_rounds=1)
    assert m3.rounds == 3 and m1.rounds == 1
    v = m3.init(jax.random.PRNGKey(0), bev, trans, mask, train=False)
    shapes = jax.tree_util.tree_map(jnp.shape, v)
    assert jax.tree_util.tree_map(jnp.shape, m1.init(
        jax.random.PRNGKey(0), bev, trans, mask, train=False)) == shapes
    out3 = m3.apply(v, bev, trans, mask, train=False)
    out1 = m1.apply(v, bev, trans, mask, train=False)  # same params, 1 round
    assert not np.allclose(np.asarray(out3["cls"]), np.asarray(out1["cls"]))
    with pytest.raises(ValueError):
        build_model("disco", CFG, gru_rounds=1)
