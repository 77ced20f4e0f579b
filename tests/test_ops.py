"""Unit tests for geometry ops against oracles (SURVEY.md §5.1 rebuild strategy)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from disconet_tpu.config import Config, tiny_config
from disconet_tpu.ops.boxes import (
    box_corners,
    box_corners_np,
    decode_boxes,
    encode_boxes,
    make_anchors,
)
from disconet_tpu.ops.losses import kd_feature_loss, softmax_focal_loss, weighted_smooth_l1
from disconet_tpu.ops.nms import rotated_nms
from disconet_tpu.ops.rotated_iou import rotated_iou_matrix, rotated_iou_np
from disconet_tpu.ops.voxelize import voxelize_occupy_jax, voxelize_occupy_np


def _random_boxes(n, rng, spread=20.0):
    boxes = np.zeros((n, 5), dtype=np.float32)
    boxes[:, 0:2] = rng.uniform(-spread, spread, size=(n, 2))
    boxes[:, 2:4] = rng.uniform(0.5, 5.0, size=(n, 2))
    boxes[:, 4] = rng.uniform(-np.pi, np.pi, size=n)
    return boxes


class TestConfig:
    def test_grid_size_defaults(self):
        cfg = Config()
        assert cfg.grid_size == (256, 256, 13)
        assert cfg.num_anchors == 6
        assert cfg.fusion_stride == 8

    def test_tiny_config(self):
        cfg = tiny_config(64)
        assert cfg.grid_size == (64, 64, 13)


class TestBoxes:
    def test_codec_roundtrip(self):
        rng = np.random.default_rng(0)
        cfg = tiny_config(64)
        anchors = make_anchors(cfg).reshape(-1, 5)
        idx = rng.integers(0, len(anchors), size=128)
        a = anchors[idx]
        gt = a.copy()
        gt[:, 0:2] += rng.uniform(-1, 1, size=(128, 2))
        gt[:, 2:4] *= rng.uniform(0.8, 1.25, size=(128, 2))
        gt[:, 4] = rng.uniform(-np.pi, np.pi, size=128)
        deltas = encode_boxes(gt, a)
        back = np.asarray(decode_boxes(deltas, a))
        np.testing.assert_allclose(back[:, :4], gt[:, :4], atol=1e-3)
        # angle wraps: compare sin/cos
        np.testing.assert_allclose(np.sin(back[:, 4]), np.sin(gt[:, 4]), atol=1e-3)
        np.testing.assert_allclose(np.cos(back[:, 4]), np.cos(gt[:, 4]), atol=1e-3)

    def test_corners_match_oracle(self):
        rng = np.random.default_rng(1)
        boxes = _random_boxes(32, rng)
        np.testing.assert_allclose(
            np.asarray(box_corners(boxes)), box_corners_np(boxes), atol=1e-4
        )

    def test_anchor_grid_shape(self):
        cfg = tiny_config(32)
        anchors = make_anchors(cfg)
        assert anchors.shape == (32, 32, 6, 5)
        # center of cell (0, 0) is lo + half voxel
        np.testing.assert_allclose(anchors[0, 0, 0, :2], [-4.0 + 0.125, -4.0 + 0.125])


class TestRotatedIoU:
    def test_axis_aligned_known(self):
        a = np.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
        b = np.array([[1.0, 0.0, 2.0, 2.0, 0.0]])
        # overlap 1x2=2, union 4+4-2=6
        np.testing.assert_allclose(rotated_iou_np(a, b)[0, 0], 2.0 / 6.0, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(rotated_iou_matrix(jnp.asarray(a), jnp.asarray(b)))[0, 0],
            2.0 / 6.0,
            atol=1e-4,
        )

    def test_rotated_45_known(self):
        # unit square vs itself rotated 45deg: intersection is regular octagon
        a = np.array([[0.0, 0.0, 1.0, 1.0, 0.0]])
        b = np.array([[0.0, 0.0, 1.0, 1.0, np.pi / 4]])
        inter = 2 * (np.sqrt(2) - 1)  # octagon area for unit square pair
        expect = inter / (2 - inter)
        np.testing.assert_allclose(rotated_iou_np(a, b)[0, 0], expect, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(rotated_iou_matrix(jnp.asarray(a), jnp.asarray(b)))[0, 0],
            expect,
            atol=1e-4,
        )

    def test_matrix_matches_oracle_random(self):
        rng = np.random.default_rng(2)
        a = _random_boxes(24, rng, spread=6.0)
        b = _random_boxes(24, rng, spread=6.0)
        got = np.asarray(rotated_iou_matrix(jnp.asarray(a), jnp.asarray(b)))
        want = rotated_iou_np(a, b)
        np.testing.assert_allclose(got, want, atol=2e-3)

    def test_self_iou_is_one(self):
        rng = np.random.default_rng(3)
        a = _random_boxes(16, rng)
        got = np.asarray(rotated_iou_matrix(jnp.asarray(a), jnp.asarray(a)))
        np.testing.assert_allclose(np.diag(got), 1.0, atol=2e-3)


class TestNMS:
    def test_suppresses_duplicates(self):
        boxes = np.array(
            [
                [0.0, 0.0, 2.0, 4.0, 0.1],
                [0.05, 0.0, 2.0, 4.0, 0.1],   # near-dup of 0
                [10.0, 10.0, 2.0, 4.0, 1.2],  # far away
            ],
            dtype=np.float32,
        )
        scores = np.array([0.9, 0.8, 0.7], dtype=np.float32)
        out_boxes, out_scores, keep = rotated_nms(
            jnp.asarray(boxes), jnp.asarray(scores), iou_threshold=0.3, top_k=8
        )
        keep = np.asarray(keep)
        assert keep.sum() == 2
        kept_scores = np.asarray(out_scores)[keep]
        np.testing.assert_allclose(sorted(kept_scores, reverse=True), [0.9, 0.7])

    def test_score_threshold(self):
        boxes = np.array([[0, 0, 2, 4, 0.0], [10, 10, 2, 4, 0.0]], dtype=np.float32)
        scores = np.array([0.9, 0.1], dtype=np.float32)
        _, _, keep = rotated_nms(
            jnp.asarray(boxes), jnp.asarray(scores),
            iou_threshold=0.3, score_threshold=0.5, top_k=4,
        )
        assert np.asarray(keep).sum() == 1

    def test_sparse_decode_matches_dense(self):
        """rotated_nms_decode (top-k then decode) == decode-all then rotated_nms.

        The codec is per-anchor, so candidate selection commutes with decoding;
        exact_top_k makes the two paths deterministic and comparable."""
        from disconet_tpu.ops.nms import rotated_nms_decode

        rng = np.random.default_rng(7)
        n = 500
        anchors = _random_boxes(n, rng, spread=20.0)
        deltas = rng.normal(0, 0.3, size=(n, 6)).astype(np.float32)
        scores = rng.uniform(0, 1, size=n).astype(np.float32)

        dense_boxes = np.asarray(decode_boxes(jnp.asarray(deltas), jnp.asarray(anchors)))
        b_ref, s_ref, k_ref = rotated_nms(
            jnp.asarray(dense_boxes), jnp.asarray(scores),
            iou_threshold=0.3, score_threshold=0.2, top_k=64, exact_top_k=True,
        )
        b, s, k = rotated_nms_decode(
            jnp.asarray(deltas), jnp.asarray(scores), jnp.asarray(anchors),
            iou_threshold=0.3, score_threshold=0.2, top_k=64, exact_top_k=True,
        )
        np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), atol=1e-6)
        np.testing.assert_allclose(np.asarray(b), np.asarray(b_ref), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(k), np.asarray(k_ref))

    def test_spatial_decode_matches_flat(self):
        """Spatial (H, W, A) two-level selection == flat (N,) selection.

        exact_top_k on both; valid (kept-or-suppressed-but-above-threshold)
        slots must agree — padding/invalid slots may order differently."""
        from disconet_tpu.ops.nms import rotated_nms_decode

        rng = np.random.default_rng(11)
        H, W, A = 8, 8, 6
        n = H * W * A
        anchors = _random_boxes(n, rng, spread=30.0).reshape(H, W, A, 5)
        deltas = rng.normal(0, 0.3, size=(H, W, A, 6)).astype(np.float32)
        scores = rng.uniform(0, 1, size=(H, W, A)).astype(np.float32)

        b_f, s_f, k_f = rotated_nms_decode(
            jnp.asarray(deltas.reshape(n, 6)), jnp.asarray(scores.reshape(n)),
            jnp.asarray(anchors.reshape(n, 5)),
            iou_threshold=0.3, score_threshold=0.2, top_k=64, exact_top_k=True,
        )
        b_s, s_s, k_s = rotated_nms_decode(
            jnp.asarray(deltas), jnp.asarray(scores), jnp.asarray(anchors),
            iou_threshold=0.3, score_threshold=0.2, top_k=64, exact_top_k=True,
        )
        valid_f = np.asarray(s_f) > -1.0
        valid_s = np.asarray(s_s) > -1.0
        np.testing.assert_array_equal(valid_s, valid_f)
        np.testing.assert_allclose(
            np.asarray(s_s)[valid_s], np.asarray(s_f)[valid_f], atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(b_s)[valid_s], np.asarray(b_f)[valid_f], atol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(k_s), np.asarray(k_f))

    def test_packed_decode_matches_spatial(self):
        """Packed (H, W, A*code) deltas == spatial (H, W, A, code) deltas.

        The packed layout is the raw head-output channel order (reg block
        anchor-major); winner rows are split per-anchor inside the NMS."""
        from disconet_tpu.ops.nms import rotated_nms_decode

        rng = np.random.default_rng(13)
        H, W, A = 8, 8, 6
        anchors = _random_boxes(H * W * A, rng, spread=30.0).reshape(H, W, A, 5)
        deltas = rng.normal(0, 0.3, size=(H, W, A, 6)).astype(np.float32)
        scores = rng.uniform(0, 1, size=(H, W, A)).astype(np.float32)

        kw = dict(iou_threshold=0.3, score_threshold=0.2, top_k=64, exact_top_k=True)
        b_s, s_s, k_s = rotated_nms_decode(
            jnp.asarray(deltas), jnp.asarray(scores), jnp.asarray(anchors), **kw
        )
        b_p, s_p, k_p = rotated_nms_decode(
            jnp.asarray(deltas.reshape(H, W, A * 6)), jnp.asarray(scores),
            jnp.asarray(anchors), **kw
        )
        np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_s), atol=1e-6)
        np.testing.assert_allclose(np.asarray(b_p), np.asarray(b_s), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(k_p), np.asarray(k_s))

    def test_suppress_fixpoint_matches_sequential(self):
        """_suppress (while-loop fixpoint) == _suppress_sequential (K-step scan).

        Includes the adversarial alternating chain — a line of overlapping
        boxes where greedy keeps every other one, so each decision depends on
        the previous one (maximum suppression-chain depth; any one-pass
        "suppressed by anything stronger" approximation gets it wrong) — plus
        random sets and a vmapped batch (the production shape: while_loop
        under vmap runs until every frame converges).
        """
        from disconet_tpu.ops.nms import _suppress, _suppress_sequential

        K = 32
        # alternating chain: x = 0, 1.2, 2.4, ... with width 2 -> neighbors
        # overlap, next-nearest don't; scores strictly descending by index
        chain = np.zeros((K, 5), np.float32)
        chain[:, 0] = np.arange(K) * 1.2
        chain[:, 2] = 2.0
        chain[:, 3] = 2.0
        chain_scores = np.linspace(0.9, 0.5, K).astype(np.float32)
        keep_fix = np.asarray(
            _suppress(jnp.asarray(chain), jnp.asarray(chain_scores), 0.1, K)
        )
        keep_seq = np.asarray(
            _suppress_sequential(jnp.asarray(chain), jnp.asarray(chain_scores), 0.1, K)
        )
        np.testing.assert_array_equal(keep_fix, keep_seq)
        assert keep_fix.sum() == (K + 1) // 2  # every other box survives

        rng = np.random.default_rng(31)
        for thr in (0.01, 0.3):
            boxes = jnp.asarray(
                np.stack([_random_boxes(K, rng, spread=8.0) for _ in range(6)])
            )
            scores = jnp.asarray(rng.uniform(0, 1, size=(6, K)).astype(np.float32))
            # some dead slots, like post-threshold candidates
            scores = scores.at[:, K - 4 :].set(-1.0)
            got = jax.vmap(lambda b, s: _suppress(b, s, thr, K))(boxes, scores)
            want = jax.vmap(lambda b, s: _suppress_sequential(b, s, thr, K))(
                boxes, scores
            )
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_heads_raw_matches_logical_views(self):
        """DetectionHeads raw packed output == its logical (cls, reg) views."""
        from disconet_tpu.models.backbone import DetectionHeads

        rng = np.random.default_rng(21)
        heads = DetectionHeads(num_anchors=6, num_classes=2, box_code_size=6)
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 32)).astype(np.float32))
        variables = heads.init(jax.random.PRNGKey(0), x)
        cls, reg, raw, _ = heads.apply(variables, x)
        NA = 6
        # class-major cls block: raw[..., c*NA + a] == cls[..., a, c]
        np.testing.assert_allclose(
            np.asarray(raw[..., :NA]), np.asarray(cls[..., 0]), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(raw[..., NA : 2 * NA]), np.asarray(cls[..., 1]), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(raw[..., 2 * NA :].reshape(2, 8, 8, 6, 6)),
            np.asarray(reg), atol=1e-6,
        )

    def test_heads_raw_bf16_storage(self):
        """raw_dtype='bfloat16' (the config default): the packed tensor is a
        bf16 *storage* cast of the fp32 accumulator — cls/reg views stay fp32
        and raw matches them to bf16 rounding (relative 2^-8)."""
        from disconet_tpu.models.backbone import DetectionHeads

        rng = np.random.default_rng(22)
        heads = DetectionHeads(
            num_anchors=6, num_classes=2, box_code_size=6, raw_dtype="bfloat16"
        )
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 32)).astype(np.float32))
        variables = heads.init(jax.random.PRNGKey(0), x)
        cls, reg, raw, _ = heads.apply(variables, x)
        assert raw.dtype == jnp.bfloat16
        assert cls.dtype == jnp.float32 and reg.dtype == jnp.float32
        NA = 6
        np.testing.assert_allclose(
            np.asarray(raw[..., NA : 2 * NA], dtype=np.float32),
            np.asarray(cls[..., 1]), rtol=2 ** -8, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(raw[..., 2 * NA :].reshape(2, 8, 8, 6, 6), dtype=np.float32),
            np.asarray(reg), rtol=2 ** -8, atol=1e-6,
        )

    @pytest.mark.parametrize(
        "H,W,NA,top_k", [(8, 8, 6, 64), (2, 2, 2, 64)]  # 2nd: H*W*NA < top_k (padding)
    )
    def test_packed_raw_nms_matches_scores_path(self, H, W, NA, top_k):
        """rotated_nms_decode_packed (selection on raw logit diffs, winners-only
        sigmoid) == rotated_nms_decode on packed_scores_and_deltas(raw) —
        array-for-array, dead slots included (zeroed boxes, score -1)."""
        from disconet_tpu.ops.nms import (
            packed_scores_and_deltas,
            rotated_nms_decode,
            rotated_nms_decode_packed,
        )

        rng = np.random.default_rng(17)
        code = 6
        anchors = _random_boxes(H * W * NA, rng, spread=30.0).reshape(H, W, NA, 5)
        raw = rng.normal(0, 1.5, size=(H, W, NA * 2 + NA * code)).astype(np.float32)

        kw = dict(iou_threshold=0.3, score_threshold=0.2, top_k=top_k, exact_top_k=True)
        scores, deltas = packed_scores_and_deltas(jnp.asarray(raw), NA)
        b_s, s_s, k_s = rotated_nms_decode(deltas, scores, jnp.asarray(anchors), **kw)
        b_p, s_p, k_p = rotated_nms_decode_packed(
            jnp.asarray(raw), jnp.asarray(anchors), num_anchors=NA, **kw
        )
        np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_s), atol=1e-6)
        np.testing.assert_allclose(np.asarray(b_p), np.asarray(b_s), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(k_p), np.asarray(k_s))
        # dead slots (padding / below threshold) carry zero boxes in both paths
        dead = np.asarray(s_s) <= -1.0
        assert dead.any() or H * W * NA >= top_k  # padding case must have them
        np.testing.assert_array_equal(np.asarray(b_s)[dead], 0.0)

    def test_foreground_scores_matches_softmax(self):
        from disconet_tpu.ops.nms import foreground_scores

        rng = np.random.default_rng(8)
        logits = rng.normal(0, 3, size=(4, 7, 2)).astype(np.float32)
        want = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))[..., 1]
        got = np.asarray(foreground_scores(jnp.asarray(logits)))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_negative_sizes_suppress_like_positive(self):
        """(cx, cy, w, l, θ) with negative w/l is the same point set as |w|,|l|
        (symmetric extents); _suppress normalizes so callers handing such boxes
        to rotated_nms get identical suppression — every IoU impl assumes
        w,l >= 0 and silently returns 0 otherwise."""
        boxes = np.array(
            [[0.0, 0.0, 2.0, 3.0, 0.3],
             [0.05, 0.0, -2.0, -3.0, 0.3],   # near-duplicate, negative sizes
             [10.0, 10.0, 2.0, 3.0, 0.0]],
            np.float32,
        )
        scores = np.array([0.9, 0.8, 0.7], np.float32)
        b, s, keep = rotated_nms(
            jnp.asarray(boxes), jnp.asarray(scores), iou_threshold=0.3, top_k=3
        )
        np.testing.assert_array_equal(np.asarray(keep), [True, False, True])

    def test_foreground_scores_multiclass_is_one_minus_background(self):
        # class 0 = background: foreground = 1 - p0, not p(class 1) — an anchor
        # confident in class 2 must still rank as a candidate
        from disconet_tpu.ops.nms import foreground_scores

        rng = np.random.default_rng(9)
        logits = rng.normal(0, 3, size=(5, 4)).astype(np.float32)
        logits[0] = [-5.0, -5.0, 8.0, -5.0]  # confident class 2
        p = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
        got = np.asarray(foreground_scores(jnp.asarray(logits)))
        np.testing.assert_allclose(got, 1.0 - p[..., 0], atol=1e-6)
        assert got[0] > 0.99

    def test_multiclass_nms_per_class_suppression(self):
        """Reference predict_all runs NMS per class (SURVEY.md C20/§4.2):
        duplicates suppress within a class; identical boxes of different
        classes both survive."""
        from disconet_tpu.ops.boxes import encode_boxes_np, make_anchors
        from disconet_tpu.ops.nms import multiclass_nms_decode

        cfg = tiny_config(32, num_classes=3)
        anchors = make_anchors(cfg)  # (H, W, A, 5)
        H, W, A = anchors.shape[:3]
        code = cfg.box_code_size
        box = np.array([1.0, 1.5, 2.0, 4.0, 0.3], np.float32)

        logits = np.zeros((H, W, A, 3), np.float32)
        logits[..., 0] = 6.0  # background everywhere
        deltas = np.zeros((H, W, A, code), np.float32)
        slots = [(10, 10, 0, 1, 9.0),   # class 1, top
                 (10, 11, 0, 1, 8.0),   # class 1, duplicate -> suppressed
                 (11, 10, 0, 2, 9.0)]   # class 2, same box -> survives
        for h, w, a, c, lg in slots:
            logits[h, w, a] = [-6.0, -6.0, -6.0]
            logits[h, w, a, c] = lg
            deltas[h, w, a] = encode_boxes_np(box[None], anchors[h, w, a][None])[0]

        b, s, keep, lbl = multiclass_nms_decode(
            jnp.asarray(deltas), jnp.asarray(logits), jnp.asarray(anchors),
            iou_threshold=0.3, score_threshold=0.3, top_k=8,
        )
        b, s, keep, lbl = map(np.asarray, (b, s, keep, lbl))
        kept = np.nonzero(keep)[0]
        assert len(kept) == 2, (kept, s[kept], lbl[kept])
        assert sorted(lbl[kept].tolist()) == [1, 2]
        for i in kept:
            np.testing.assert_allclose(b[i], box, atol=1e-4)

    def test_multiclass_nms_binary_reduces_to_foreground_path(self):
        from disconet_tpu.ops.boxes import make_anchors
        from disconet_tpu.ops.nms import (
            foreground_scores,
            multiclass_nms_decode,
            rotated_nms_decode,
        )

        cfg = tiny_config(32)
        anchors = make_anchors(cfg)
        H, W, A = anchors.shape[:3]
        rng = np.random.default_rng(11)
        logits = rng.normal(0, 2, size=(H, W, A, 2)).astype(np.float32)
        deltas = rng.normal(0, 0.1, size=(H, W, A, cfg.box_code_size)).astype(np.float32)
        b1, s1, k1, lbl = multiclass_nms_decode(
            jnp.asarray(deltas), jnp.asarray(logits), jnp.asarray(anchors),
            iou_threshold=0.3, score_threshold=0.5, top_k=16, exact_top_k=True,
        )
        b2, s2, k2 = rotated_nms_decode(
            jnp.asarray(deltas), foreground_scores(jnp.asarray(logits)),
            jnp.asarray(anchors),
            iou_threshold=0.3, score_threshold=0.5, top_k=16, exact_top_k=True,
        )
        np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=1e-5)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
        assert np.all(np.asarray(lbl) == 1)


class TestVoxelize:
    def test_matches_oracle_random(self):
        rng = np.random.default_rng(4)
        cfg = tiny_config(32)
        pts = rng.uniform(-5, 5, size=(512, 3)).astype(np.float32)
        pts[:, 2] = rng.uniform(-4, 3, size=512)
        want = voxelize_occupy_np(pts, cfg.voxel_size, cfg.area_extents)
        got = np.asarray(
            voxelize_occupy_jax(jnp.asarray(pts), cfg.voxel_size, cfg.area_extents)
        )
        np.testing.assert_array_equal(got, want)

    def test_mask_and_nan_padding(self):
        cfg = tiny_config(32)
        pts = np.full((16, 3), np.nan, dtype=np.float32)
        pts[0] = [0.0, 0.0, 0.0]
        mask = np.zeros(16, dtype=bool)
        mask[0] = True
        got = np.asarray(
            voxelize_occupy_jax(
                jnp.asarray(pts), cfg.voxel_size, cfg.area_extents, mask=jnp.asarray(mask)
            )
        )
        assert got.sum() == 1

    def test_batched(self):
        rng = np.random.default_rng(5)
        cfg = tiny_config(16)
        pts = rng.uniform(-2, 2, size=(3, 4, 64, 3)).astype(np.float32)
        out = voxelize_occupy_jax(jnp.asarray(pts), cfg.voxel_size, cfg.area_extents)
        assert out.shape == (3, 4) + cfg.grid_size

    def test_np_impl_honors_mask(self):
        # the dispatcher's 'np' path must drop masked padding rows like the
        # device paths do — zero-padded rows are in-extent for symmetric extents
        from disconet_tpu.ops.voxelize import voxelize_occupy

        cfg = tiny_config(32)
        pts = np.zeros((8, 3), dtype=np.float32)  # all at the center cell
        pts[0] = [1.0, 1.0, 0.0]
        mask = np.zeros(8, dtype=bool)
        mask[0] = True
        got = voxelize_occupy(pts, cfg.voxel_size, cfg.area_extents, mask=mask, impl="np")
        assert got.sum() == 1
        ref = np.asarray(
            voxelize_occupy(pts, cfg.voxel_size, cfg.area_extents, mask=mask, impl="jax")
        )
        np.testing.assert_array_equal(got, ref)

    def test_grid_dims_shared_rule(self):
        # one grid-shape rule across impls, incl. geometries where f32 vs f64
        # division of the cell count would round differently
        from disconet_tpu.ops.voxelize import grid_dims

        geoms = [
            ((0.25, 0.25, 0.4), ((-32.0, 32.0), (-32.0, 32.0), (-3.0, 2.0))),
            ((0.1, 0.1, 0.1), ((-1.0, 1.0), (-1.0, 1.0), (0.0, 0.7))),
            ((0.3, 0.3, 0.3), ((-0.95, 0.95), (-0.95, 0.95), (0.0, 0.9))),
        ]
        for vs, ext in geoms:
            dims = grid_dims(vs, ext)
            oracle = voxelize_occupy_np(np.zeros((0, 3), np.float32), vs, ext)
            assert oracle.shape == dims, (vs, ext)
            dev = voxelize_occupy_jax(jnp.zeros((1, 3)), vs, ext)
            assert dev.shape == dims, (vs, ext)


class TestLosses:
    def test_focal_reduces_to_ce_at_gamma0(self):
        rng = np.random.default_rng(6)
        logits = rng.normal(size=(32, 2)).astype(np.float32)
        labels = rng.integers(0, 2, size=32)
        one_hot = np.eye(2, dtype=np.float32)[labels]
        got = float(softmax_focal_loss(jnp.asarray(logits), jnp.asarray(one_hot), gamma=0.0))
        # manual CE
        ex = np.exp(logits - logits.max(-1, keepdims=True))
        p = ex / ex.sum(-1, keepdims=True)
        want = -np.mean(np.log(p[np.arange(32), labels]))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_focal_downweights_easy(self):
        easy = jnp.asarray([[5.0, -5.0]])
        hard = jnp.asarray([[0.1, -0.1]])
        tgt = jnp.asarray([[1.0, 0.0]])
        l_easy = float(softmax_focal_loss(easy, tgt, gamma=2.0))
        l_hard = float(softmax_focal_loss(hard, tgt, gamma=2.0))
        assert l_easy < l_hard

    def test_smooth_l1_masked(self):
        pred = jnp.asarray([[1.0, 0.0], [100.0, 100.0]])
        tgt = jnp.zeros((2, 2))
        mask = jnp.asarray([[1.0, 1.0], [0.0, 0.0]])
        sigma = 3.0
        got = float(weighted_smooth_l1(pred, tgt, mask, sigma=sigma))
        # |d|=1 -> 1 - 0.5/9 ; |d|=0 -> 0; mean over 2 valid
        want = (1.0 - 0.5 / 9.0) / 2.0
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_kd_masked(self):
        s = jnp.ones((2, 4, 4, 8))
        t = jnp.zeros((2, 4, 4, 8))
        mask = jnp.asarray([1.0, 0.0])
        got = float(kd_feature_loss(s, t, mask=mask))
        np.testing.assert_allclose(got, 1.0, rtol=1e-5)
