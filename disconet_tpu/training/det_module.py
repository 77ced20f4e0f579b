"""Detection train/eval module (SURVEY.md C20, reference utils/CoDetModule.py).

The reference ``FaFModule`` is a stateful class whose ``step()`` runs
forward/backward eagerly per batch. The TPU rebuild is a pair of pure, jitted
functions closed over the model definition:

  * ``train_step(state, batch, teacher_vars)`` — one fused XLA graph:
    (optional) frozen-teacher forward, student forward, focal + masked
    smooth-L1 (+ kd_weight * per-pixel feature MSE, SURVEY.md §4.3), Adam
    update, BatchNorm running-stat update. Donated state, bf16 conv compute.
  * ``eval_step`` — forward + losses, no update (validation loss).
  * ``predict_step`` — forward -> per-class softmax scores -> on-device anchor
    decode -> per-agent rotated NMS (SURVEY.md C8), fixed-size outputs.

Loss masking invariants (SURVEY.md §7 "hard parts"): absent agents are removed
from the classification loss, the regression mask, and the KD loss; the sender
softmax inside fusion models is masked separately (models/base.py).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.training import train_state

from disconet_tpu.config import Config
from disconet_tpu.ops.bitpack import pack_bev_np, unpack_bev, unpack_bev_np
from disconet_tpu.ops.boxes import make_anchors
from disconet_tpu.ops.losses import (
    kd_feature_loss,
    packed_det_losses,
    softmax_focal_loss,
    weighted_smooth_l1,
)
from disconet_tpu.ops.nms import (
    foreground_scores,
    packed_scores_and_deltas,
    rotated_nms_decode,
    rotated_nms_decode_packed,
)


def get_bev(batch, key: str, config: Config):
    """Fetch a BEV tensor from a device batch, unpacking the bit-packed
    transport encoding (ops/bitpack.py) when present. A dense ``key`` entry
    wins over ``key_packed`` so callers can override; step functions accept
    either layout (tests and legacy callers pass dense grids)."""
    if key in batch:
        return batch[key]
    return unpack_bev(batch[key + "_packed"], config.bev_shape[-1])


def get_bev_np(batch, key: str, config: Config) -> np.ndarray:
    """Host twin of :func:`get_bev` (model init, visualization, tests)."""
    if key in batch:
        return np.asarray(batch[key])
    return unpack_bev_np(np.asarray(batch[key + "_packed"]), config.bev_shape[-1])


class DetTrainState(train_state.TrainState):
    """TrainState + BatchNorm running statistics."""

    batch_stats: Any = None


def create_train_state(
    model, config: Config, rng, sample_batch: Dict[str, np.ndarray], lr: float = 1e-3
) -> DetTrainState:
    """Initialize params/batch_stats from a sample batch and build Adam(lr).

    Reference: Adam(1e-3), no schedule, no weight decay (SURVEY.md C22).
    """
    variables = model.init(
        rng,
        jnp.asarray(get_bev_np(sample_batch, "bev", config)),
        jnp.asarray(sample_batch["trans"]),
        jnp.asarray(sample_batch["agent_mask"]),
        train=False,
    )
    tx = optax.adam(lr)
    return DetTrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )


def _losses(out, batch, config: Config, teacher_out=None):
    """Shared loss computation for train/eval. All fp32.

    Two target encodings (numerically equivalent):
      * sparse (preferred, keys ``reg_pos_idx``/``reg_pos_target``): the host
        ships only positive-anchor (flat index, delta) pairs (~50 KB/frame vs
        ~10 MB dense over the device tunnel); the dense binary cls label and
        the positive mask are reconstructed on device with one scatter, and
        reg predictions are gathered at the positive indices.
      * dense (``label_one_hot``/``reg_target``/``reg_mask``): reference
        layout, kept for back-compat.
    """
    agent_mask = batch["agent_mask"].astype(jnp.float32)  # (B, A)

    if (
        "reg_pos_idx" in batch
        and "head_raw_f32" in out
        and getattr(config, "packed_loss", True)
    ):
        # packed path (default): both losses straight from the fp32 packed
        # head tensor — no (B,A,H,W,NA,·) tensor with a tiny minor dim is
        # ever materialized (each costs up to 85x physical HBM on TPU; the
        # view-based path below measured 49% of the train step,
        # docs/performance.md train roofline). Numerically equal to the
        # view path (tests/test_packed_loss.py, values AND gradients).
        cls_loss, reg_loss = packed_det_losses(
            out["head_raw_f32"],
            batch["reg_pos_idx"],
            batch["reg_pos_target"],
            agent_mask,
            num_anchors=config.num_anchors,
            num_classes=config.num_classes,
            box_code_size=config.box_code_size,
            pos_cls=batch.get("reg_pos_cls"),
            gamma=config.focal_gamma,
            sigma=config.smooth_l1_sigma,
        )
        return _finish_losses(cls_loss, reg_loss, out, config, teacher_out, agent_mask)

    # broadcast agent mask over (B, A, H, W, Anch)
    am = agent_mask[:, :, None, None, None]
    cls_mask = jnp.broadcast_to(am, out["cls"].shape[:-1])

    if "reg_pos_idx" in batch:
        B, A, H, W, NA, code = out["reg"].shape
        n_flat = H * W * NA
        idx = batch["reg_pos_idx"].astype(jnp.int32)  # (B, A, P), sentinel n_flat
        valid = (idx < n_flat).astype(jnp.float32)

        def scatter_pos(flat_idx):  # (P,) -> (n_flat,)
            return jnp.zeros((n_flat,), jnp.float32).at[flat_idx].set(1.0, mode="drop")

        if "reg_pos_cls" in batch:  # multi-class: scatter class ids, then one-hot
            cls_ids = batch["reg_pos_cls"].astype(jnp.int32)  # (B, A, P)

            def scatter_cls(flat_idx, ids):  # (P,),(P,) -> (n_flat,) int
                return (
                    jnp.zeros((n_flat,), jnp.int32).at[flat_idx].set(ids, mode="drop")
                )

            cls_map = jax.vmap(jax.vmap(scatter_cls))(idx, cls_ids)
            C = out["cls"].shape[-1]
            label_one_hot = jax.nn.one_hot(
                cls_map.reshape(B, A, H, W, NA), C, dtype=jnp.float32
            )
        else:
            pos = jax.vmap(jax.vmap(scatter_pos))(idx)  # (B, A, n_flat)
            pos = pos.reshape(B, A, H, W, NA)
            label_one_hot = jnp.stack([1.0 - pos, pos], axis=-1)
        cls_loss = softmax_focal_loss(
            out["cls"], label_one_hot, gamma=config.focal_gamma, mask=cls_mask
        )
        pred_flat = out["reg"].reshape(B, A, n_flat, code).astype(jnp.float32)
        safe_idx = jnp.minimum(idx, n_flat - 1)
        pred_pos = jnp.take_along_axis(pred_flat, safe_idx[..., None], axis=2)
        reg_loss = weighted_smooth_l1(
            pred_pos,
            batch["reg_pos_target"],
            (valid * agent_mask[:, :, None])[..., None],
            sigma=config.smooth_l1_sigma,
        )
    else:
        cls_loss = softmax_focal_loss(
            out["cls"], batch["label_one_hot"], gamma=config.focal_gamma, mask=cls_mask
        )
        reg_mask = batch["reg_mask"].astype(jnp.float32) * am
        reg_loss = weighted_smooth_l1(
            out["reg"], batch["reg_target"], reg_mask[..., None], sigma=config.smooth_l1_sigma
        )
    return _finish_losses(cls_loss, reg_loss, out, config, teacher_out, agent_mask)


def _finish_losses(cls_loss, reg_loss, out, config, teacher_out, agent_mask):
    """Weighted total + optional KD term (shared by both loss paths)."""
    loss = config.cls_weight * cls_loss + config.reg_weight * reg_loss
    metrics = {"cls_loss": cls_loss, "reg_loss": reg_loss}
    if teacher_out is not None:
        kd = 0.0
        for sf, tf in zip(out["kd_feats"], teacher_out["kd_feats"]):
            kd = kd + kd_feature_loss(sf, jax.lax.stop_gradient(tf), mask=agent_mask)
        kd = kd / len(out["kd_feats"])
        metrics["kd_loss"] = kd
        loss = loss + config.kd_weight * kd
    metrics["loss"] = loss
    return loss, metrics


def make_train_step(
    model,
    config: Config,
    teacher=None,
    kd_flag: bool = False,
    kd_from_cache: bool = False,
) -> Callable:
    """Build the jitted training step. ``teacher`` is a TeacherNet whose frozen
    variables are passed per-call (never optimized; README.md:59).

    With ``kd_from_cache=True`` the third step argument is instead the tuple of
    HBM-resident per-frame teacher feature tables from
    :func:`precompute_teacher_feats`, and the step gathers the batch's rows by
    ``batch["frame_idx"]`` instead of re-running the frozen teacher — the
    teacher's features are epoch-invariant, so the reference's per-step teacher
    forward (inherited from its on-GPU teacher) is pure recompute waste here.
    """

    def train_step(state: DetTrainState, batch, teacher_vars=None):
        teacher_out = None
        if kd_flag and kd_from_cache:
            idx = batch["frame_idx"].astype(jnp.int32)
            B = idx.shape[0]

            def rows(f):
                # B explicit dynamic slices, not jnp.take: XLA lowers the
                # multi-row gather from a multi-GB table as a full-table pass
                # (measured 32.5 ms vs 6.0 ms for 4 rows of the 4.7 GB
                # 256^2-geometry tables on v5e); per-row dynamic_index_in_dim
                # is a row-sized DMA. Kept bf16 — the KD MSE upcasts per
                # element inside its fusion, no materialized f32 copy.
                return jnp.stack(
                    [jax.lax.dynamic_index_in_dim(f, idx[i], 0, keepdims=False)
                     for i in range(B)]
                )

            teacher_out = {"kd_feats": [rows(f) for f in teacher_vars]}
        elif kd_flag and teacher is not None:
            teacher_out = teacher.apply(
                teacher_vars,
                get_bev(batch, "bev_teacher", config),
                None,
                batch["agent_mask"],
                train=False,
            )

        def loss_fn(params):
            def fwd(params):
                out, mutated = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    get_bev(batch, "bev", config),
                    batch["trans"],
                    batch["agent_mask"],
                    train=True,
                    mutable=["batch_stats"],
                )
                # head_raw is inference-only (predict path); keep it out of
                # the (possibly checkpointed) training graph's outputs
                out.pop("head_raw", None)
                return out, mutated["batch_stats"]

            if getattr(config, "train_remat", False):
                # save only the tagged stage boundaries (backbone.py /
                # models/base.py); the backward rematerializes each stage's
                # conv/BN intermediates from its input instead of reading
                # them back from HBM as fp32 residuals
                fwd = jax.checkpoint(
                    fwd,
                    policy=jax.checkpoint_policies.save_only_these_names(
                        "stage_boundary"
                    ),
                )
            out, new_stats = fwd(params)
            loss, metrics = _losses(out, batch, config, teacher_out)
            return loss, (metrics, new_stats)

        (loss, (metrics, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=new_stats)
        metrics["grad_norm"] = optax.global_norm(grads)
        return state, metrics

    return jax.jit(train_step, donate_argnums=(0,))


def make_train_step_multi(
    model,
    config: Config,
    teacher=None,
    kd_flag: bool = False,
    kd_from_cache: bool = False,
) -> Callable:
    """K optimizer steps per device dispatch: ``lax.scan`` of the single step
    over a stacked batch (every leaf gains a leading K axis; see
    :func:`stack_host_batches`).

    Why: each jitted call over the axon tunnel pays a dispatch round trip. At
    the full 256^2 geometry the step's compute (~127 ms) hides it, but the
    64-grid quality-matrix cells are RTT-bound — thousands of tiny steps
    serialized on the wire. Scanning K steps inside one XLA program pays one
    round trip (and one transfer) per K steps, with semantics identical to K
    sequential calls: state (params, optimizer, BN running stats) is threaded
    through the scan. Equality with the sequential path is unit-tested at the
    step level in f32 (`test_multi_step_dispatch_matches_sequential`); exact
    long-horizon bit-equality across the two paths is NOT expected — they are
    different XLA programs, so near-zero f32/bf16 gradient components can
    round differently, which chaotic training dynamics then amplify (and Adam
    turns any sign flip of a tiny gradient into a full ±lr step).

    Returns metrics stacked per step, shape (K,) per leaf — callers log the
    last row.
    """
    base = make_train_step(model, config, teacher=teacher, kd_flag=kd_flag,
                           kd_from_cache=kd_from_cache)
    # scan over the UNJITTED body: nesting jit inside scan is fine but
    # pointless; grab the wrapped function to avoid double tracing.
    body = getattr(base, "__wrapped__", base)

    def multi_step(state: DetTrainState, batches, teacher_vars=None):
        def scan_body(st, batch):
            return body(st, batch, teacher_vars)

        return jax.lax.scan(scan_body, state, batches)

    return jax.jit(multi_step, donate_argnums=(0,))


def stack_host_batches(batches) -> Dict[str, np.ndarray]:
    """Stack K same-shaped host batch dicts into one superbatch for
    :func:`make_train_step_multi` (array leaves only — list-valued keys like
    ``gt_boxes`` never ship to device and are dropped)."""
    keys = [k for k in batches[0] if isinstance(batches[0][k], np.ndarray)]
    return {k: np.stack([b[k] for b in batches]) for k in keys}


def teacher_feat_bytes(
    teacher, teacher_vars, config: Config, n_frames: int, dtype=jnp.bfloat16,
    batch_size: int = 1,
) -> int:
    """Size of the full-dataset KD feature cache (abstract eval, no FLOPs).

    ``batch_size``: the precompute batch size — tables are padded to a whole
    number of batches (the tail padding rows are never gathered), so sizing
    against ``--kd_cache_gb`` must count ceil(n/b)*b rows, not n.
    """
    n_frames = -(-n_frames // batch_size) * batch_size
    H, W = config.map_dims
    MA, Z = config.max_agents, config.grid_size[2]
    bev = jax.ShapeDtypeStruct((1, MA, H, W, Z), jnp.float32)
    mask = jax.ShapeDtypeStruct((1, MA), jnp.bool_)
    out = jax.eval_shape(
        lambda v, b, m: teacher.apply(v, b, None, m, train=False),
        teacher_vars, bev, mask,
    )
    per_frame = sum(int(np.prod(f.shape[1:])) for f in out["kd_feats"])
    return per_frame * n_frames * jnp.dtype(dtype).itemsize


def precompute_teacher_feats(
    teacher,
    teacher_vars,
    dataset,
    config: Config,
    batch_size: int = 4,
    dtype=jnp.bfloat16,
    num_workers: int = 2,
    mesh=None,
):
    """One frozen-teacher pass over the dataset -> HBM-resident KD tables.

    Returns a tuple of device arrays ``[(N_pad, A, h, w, c), ...]`` (one per
    KD tap, rows addressed by ``batch["frame_idx"]``; N_pad = len(dataset)
    rounded up to whole batches, the padding rows are never gathered) for
    ``make_train_step(kd_from_cache=True)``. Teacher features never change
    across epochs (frozen params, eval-mode BN), so this converts the KD
    training tax from a per-step teacher forward + per-step ``bev_teacher``
    transfer into a one-time pass + an on-device row gather. Storage defaults
    to bf16 (the KD MSE target tolerates the ~0.4%% rounding; pass
    ``jnp.float32`` for bit-parity with recompute). Size it first with
    :func:`teacher_feat_bytes` — the tables live in HBM for the whole run.

    With ``mesh`` given (multi-device training), the tables are replicated so
    the per-shard gathers stay local.
    """
    from disconet_tpu.data.dataset import BatchIterator, pad_batch_to

    @jax.jit
    def fwd(tv, bev_teacher, agent_mask):
        out = teacher.apply(tv, bev_teacher, None, agent_mask, train=False)
        return [f.astype(dtype) for f in out["kd_feats"]]

    # Each batch's rows are written straight into pre-allocated tables with a
    # donated dynamic_update_slice (an in-place row DMA). Holding every chunk
    # and jnp.concatenate-ing at the end doubles peak HBM versus the
    # --kd_cache_gb budget the cache was sized against: the full chunk set
    # stays resident while the concat materializes the second copy.
    @functools.partial(jax.jit, donate_argnums=(0,))
    def write_rows(table, rows, start):
        # start is traced (one compile for every offset, not one per batch)
        return jax.lax.dynamic_update_slice_in_dim(table, rows, start, axis=0)

    n = len(dataset)
    loader = BatchIterator(
        dataset, batch_size, shuffle=False, drop_last=False, num_workers=num_workers
    )
    tables, order, offset = None, [], 0
    for batch in loader:
        order.extend(np.asarray(batch["frame_idx"]).tolist())
        batch = pad_batch_to(batch, batch_size, config.max_agents)
        dev = batch_to_device(
            {k: batch[k] for k in ("bev_teacher", "bev_teacher_packed", "agent_mask")
             if k in batch}
        )
        rows = fwd(teacher_vars, get_bev(dev, "bev_teacher", config),
                   dev["agent_mask"])
        if tables is None:
            # padded to a whole number of batches; the tail padding rows are
            # never gathered (frame_idx < n) — trimming to n would copy.
            n_pad = -(-n // batch_size) * batch_size
            tables = [jnp.zeros((n_pad, *r.shape[1:]), dtype) for r in rows]
        tables = [write_rows(t, r, jnp.int32(offset)) for t, r in zip(tables, rows)]
        offset += batch_size
    assert order == list(range(n)), "shuffle=False iteration must be dataset order"
    feats = tuple(tables)
    if mesh is not None and mesh.devices.size > 1:
        from disconet_tpu.parallel.mesh import replicated

        feats = tuple(jax.device_put(f, replicated(mesh)) for f in feats)
    return feats


def make_eval_step(model, config: Config, teacher=None, kd_flag: bool = False) -> Callable:
    def eval_step(state: DetTrainState, batch, teacher_vars=None):
        teacher_out = None
        if kd_flag and teacher is not None:
            teacher_out = teacher.apply(
                teacher_vars,
                get_bev(batch, "bev_teacher", config),
                None,
                batch["agent_mask"],
                train=False,
            )
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            get_bev(batch, "bev", config),
            batch["trans"],
            batch["agent_mask"],
            train=False,
        )
        _, metrics = _losses(out, batch, config, teacher_out)
        return metrics

    return jax.jit(eval_step)


def make_predict_step(model, config: Config) -> Callable:
    """Build the jitted inference step: forward -> decode -> rotated NMS.

    Returns fixed-size per-agent detections: boxes (B, A, K, 5), scores
    (B, A, K), keep (B, A, K) bool. Host code filters by keep & agent_mask.

    Multi-class configs (``config.num_classes > 2``) run the reference's
    per-class NMS (ops/nms.py::multiclass_nms_decode) and return a 4-tuple
    ``(boxes, scores, keep, labels)`` with K' = (num_classes-1)*K slots per
    agent; the binary contract above is unchanged.
    """
    anchors = make_anchors(config)  # (H, W, A, 5) trace-time constant
    K = config.nms_top_k

    def predict(state: DetTrainState, batch):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            get_bev(batch, "bev", config),
            batch["trans"],
            batch["agent_mask"],
            train=False,
        )
        B, A = out["cls"].shape[:2]
        if config.num_classes > 2:
            from disconet_tpu.ops.nms import multiclass_nms_decode

            deltas = out["reg"].reshape((B * A,) + out["reg"].shape[2:]).astype(jnp.float32)
            cls = out["cls"].reshape((B * A,) + out["cls"].shape[2:])
            mc = functools.partial(
                multiclass_nms_decode,
                anchors=jnp.asarray(anchors),
                iou_threshold=config.nms_iou_threshold,
                score_threshold=config.score_threshold,
                top_k=K,
            )
            b, s, keep, lbl = jax.vmap(mc)(deltas, cls)
            KT = (config.num_classes - 1) * K
            return (
                b.reshape(B, A, KT, 5),
                s.reshape(B, A, KT),
                keep.reshape(B, A, KT) & batch["agent_mask"][:, :, None],
                lbl.reshape(B, A, KT),
            )
        if (
            "head_raw" in out
            and config.num_classes == 2
            and getattr(config, "packed_nms", False)
        ):
            # fastest path: candidate selection straight from the packed raw
            # logits via the lane-roll cell max — no (H, W, NA)-minor score
            # tensor exists at all (see config.packed_nms / tools/bench_cand.py)
            raw = out["head_raw"].reshape((B * A,) + out["head_raw"].shape[2:])
            nms_packed = functools.partial(
                rotated_nms_decode_packed,
                anchors=jnp.asarray(anchors),
                num_anchors=config.num_anchors,
                iou_threshold=config.nms_iou_threshold,
                score_threshold=config.score_threshold,
                top_k=K,
            )
            b, s, keep = jax.vmap(nms_packed)(raw)
            return (
                b.reshape(B, A, K, 5),
                s.reshape(B, A, K),
                keep.reshape(B, A, K) & batch["agent_mask"][:, :, None],
            )
        if "head_raw" in out and config.num_classes == 2:
            # fast path: stay in the conv-native packed channel layout —
            # no relayout of the head outputs (ops/nms.py helper). The
            # pre-lane-roll history: skipping the score tensor with SLICED
            # lane diffs measured slower (196.7 -> 149 scenes/s, minor-dim-6
            # intermediates); config.packed_nms above is the fixed version.
            raw = out["head_raw"].reshape((B * A,) + out["head_raw"].shape[2:])
            scores, deltas = packed_scores_and_deltas(raw, config.num_anchors)
        else:
            # leading-dim merges only — the (H, W, A[, code]) layout is kept so
            # candidate selection/gather never relayouts the ~400k-anchor tensors
            scores = foreground_scores(out["cls"]).reshape((B * A,) + out["cls"].shape[2:-1])
            deltas = out["reg"].reshape((B * A,) + out["reg"].shape[2:]).astype(jnp.float32)

        # top-k first, decode only the K winners (not all ~400k anchors/frame)
        nms = functools.partial(
            rotated_nms_decode,
            anchors=jnp.asarray(anchors),
            iou_threshold=config.nms_iou_threshold,
            score_threshold=config.score_threshold,
            top_k=K,
        )
        b, s, keep = jax.vmap(nms)(deltas, scores)
        return (
            b.reshape(B, A, K, 5),
            s.reshape(B, A, K),
            keep.reshape(B, A, K) & batch["agent_mask"][:, :, None],
        )

    return jax.jit(predict)


_DEVICE_KEYS = (
    "bev",
    "bev_teacher",
    "bev_packed",
    "bev_teacher_packed",
    "label_one_hot",
    "reg_target",
    "reg_mask",
    "reg_pos_idx",
    "reg_pos_target",
    "reg_pos_cls",
    "seg_label",
    "trans",
    "agent_mask",
    "frame_idx",
)
# dense target tensors are redundant (and ~250 MB/batch over the device
# tunnel) when the sparse encoding is present
_DENSE_TARGET_KEYS = ("label_one_hot", "reg_target", "reg_mask")
# binary grids ship bit-packed over the z axis (6.5x less tunnel traffic,
# ops/bitpack.py); the step functions unpack on device (get_bev)
_PACK_KEYS = ("bev", "bev_teacher")


def batch_to_device(batch: Dict[str, np.ndarray], sharding=None) -> Dict[str, jnp.ndarray]:
    """Host batch dict -> device arrays (optionally with a NamedSharding)."""
    sparse = "reg_pos_idx" in batch
    out = {}
    for k in _DEVICE_KEYS:
        if k not in batch or (sparse and k in _DENSE_TARGET_KEYS):
            continue
        arr, key = batch[k], k
        if k in _PACK_KEYS and np.asarray(arr).dtype in (np.uint8, np.bool_):
            arr, key = pack_bev_np(arr), k + "_packed"
        # np.asarray (not jnp): jnp.asarray would commit the array to the
        # default device first and device_put would transfer it AGAIN —
        # host<->device bandwidth over the tunnel is precious
        out[key] = (
            jax.device_put(np.asarray(arr), sharding) if sharding else jnp.asarray(arr)
        )
    return out


def pipeline_one_deep(batches, dispatch, fetch=None):
    """One-deep async prediction pipeline for eval CLIs.

    Dispatches batch n+1's device computation before fetching batch n's
    outputs, overlapping the device step with host-side post-processing.
    Yields (host_batch, fetched_outputs). ``dispatch(batch) -> device futures``;
    ``fetch`` defaults to ``jax.device_get``.
    """
    fetch = fetch or jax.device_get
    pending = None
    for b in batches:
        fut = dispatch(b)
        if pending is not None:
            yield pending[0], fetch(pending[1])
        pending = (b, fut)
    if pending is not None:
        yield pending[0], fetch(pending[1])


def prefetch_to_device(batches, to_device=batch_to_device, depth: int = 2):
    """Wrap a host-batch iterator so host->device transfers run ahead.

    Transfers run on a dedicated thread: over the axon tunnel ``device_put``
    consumes the *calling* thread for the full wire time (~70 MB/s measured,
    bandwidth- not latency-bound), so issuing it from the training thread
    serializes transfer behind step dispatch even though the API is nominally
    async. A single background thread restores the overlap (device_put
    releases the GIL while the bytes move). ``to_device`` defaults to
    :func:`batch_to_device`; pass ``functools.partial(shard_batch, mesh=mesh)``
    for the multi-device path.
    """
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(1)
    try:
        buf = deque()
        for b in batches:
            buf.append(pool.submit(to_device, b))
            if len(buf) >= depth:
                yield buf.popleft().result()
        while buf:
            yield buf.popleft().result()
    finally:
        # on abandonment, don't run queued-but-unstarted transfers to
        # completion — each is seconds of wasted tunnel time; only the
        # in-flight one is uncancellable
        pool.shutdown(wait=True, cancel_futures=True)
