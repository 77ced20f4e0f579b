"""Segmentation train/eval module (SURVEY.md C21, reference utils/SegModule.py).

Cross-entropy over per-cell class logits, per-class IoU / mIoU evaluation.
Shares the DetTrainState container; masking removes absent agents.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from disconet_tpu.config import Config
from disconet_tpu.training.det_module import (
    DetTrainState,
    create_train_state,
    get_bev,
    get_bev_np,
)

# identical init recipe (model.init on the sample batch + Adam(lr)); the seg
# name is kept for CLI readability
create_seg_train_state = create_train_state


def _seg_loss(out, batch):
    logits = out["seg"].astype(jnp.float32)  # (B, A, H, W, C)
    labels = batch["seg_label"].astype(jnp.int32)
    am = batch["agent_mask"].astype(jnp.float32)[:, :, None, None]
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    w = jnp.broadcast_to(am, ce.shape)
    denom = jnp.maximum(jnp.sum(w), 1.0)
    loss = jnp.sum(ce * w) / denom
    acc = jnp.sum((jnp.argmax(logits, -1) == labels) * w) / denom
    return loss, {"loss": loss, "acc": acc}


def make_seg_train_step(model, config: Config) -> Callable:
    def train_step(state: DetTrainState, batch):
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
                return out, mutated["batch_stats"]

            if getattr(config, "train_remat", False):
                # same policy remat as det_module.make_train_step; both the
                # UNet and STPN backbones carry the stage_boundary tags
                fwd = jax.checkpoint(
                    fwd,
                    policy=jax.checkpoint_policies.save_only_these_names(
                        "stage_boundary"
                    ),
                )
            out, new_stats = fwd(params)
            loss, metrics = _seg_loss(out, batch)
            return loss, (metrics, new_stats)

        (loss, (metrics, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads=grads).replace(batch_stats=new_stats)
        return state, metrics

    return jax.jit(train_step, donate_argnums=(0,))


def make_seg_train_step_multi(model, config: Config) -> Callable:
    """K seg steps per device dispatch — the seg analog of
    ``det_module.make_train_step_multi`` (same RTT rationale and the same
    scan-threading semantics; metrics come back stacked per step)."""
    base = make_seg_train_step(model, config)
    body = getattr(base, "__wrapped__", base)

    def multi_step(state: DetTrainState, batches):
        return jax.lax.scan(lambda st, b: body(st, b), state, batches)

    return jax.jit(multi_step, donate_argnums=(0,))


def make_seg_predict_step(model, config: Config) -> Callable:
    def predict(state: DetTrainState, batch):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            get_bev(batch, "bev", config),
            batch["trans"],
            batch["agent_mask"],
            train=False,
        )
        return jnp.argmax(out["seg"], axis=-1)  # (B, A, H, W)

    return jax.jit(predict)


def iou_per_class(pred: np.ndarray, label: np.ndarray, num_classes: int, mask=None) -> Dict:
    """Per-class IoU + mIoU over accumulated (pred, label) grids (SURVEY.md C21)."""
    pred = np.asarray(pred)
    if mask is not None:
        keep = np.broadcast_to(np.asarray(mask), pred.shape).astype(bool).reshape(-1)
    pred = pred.reshape(-1)
    label = np.asarray(label).reshape(-1)
    if mask is not None:
        pred, label = pred[keep], label[keep]
    ious = {}
    present = []
    for c in range(num_classes):
        inter = np.sum((pred == c) & (label == c))
        union = np.sum((pred == c) | (label == c))
        if union > 0:
            ious[c] = float(inter / union)
            present.append(ious[c])
        else:
            ious[c] = float("nan")
    return {"iou": ious, "miou": float(np.mean(present)) if present else 0.0}
