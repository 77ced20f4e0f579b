"""Checkpoint / resume (SURVEY.md §5.4-5.5, reference train_codet.py C22).

Two interchangeable formats:

  * **Orbax** (native): per-epoch ``CheckpointManager`` saves of
    {params, batch_stats, opt_state, epoch} with latest-step discovery — the
    rebuild's ``--auto_resume_path`` semantics (README.md:60: scan the log dir
    for the latest epoch and continue).
  * **.pth bridge** (compat): the reference saves
    ``{'epoch','model_state_dict','optimizer_state_dict','loss'}`` per epoch
    (tier-[B], SURVEY.md §5.5). :func:`save_pth` / :func:`load_pth` convert a
    flax param tree to/from a torch ``state_dict`` (torch-CPU is installed for
    exactly this). Naming/layout rules live in one table (``_KEY_RULES``) so a
    parity fix against a real reference checkpoint is a data change.

Layout conversions: Conv kernels HWIO (flax) <-> OIHW (torch); Dense kernels
(in, out) <-> (out, in); BatchNorm {scale, bias, mean, var} <->
{weight, bias, running_mean, running_var}.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

try:  # orbax is in the image; keep the import soft for minimal environments
    import orbax.checkpoint as ocp
except Exception:  # pragma: no cover
    ocp = None


class CheckpointIO:
    """Per-epoch orbax checkpointing with auto-resume (latest-step discovery)."""

    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        if ocp is None:
            raise RuntimeError("orbax-checkpoint not available")
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def save(self, epoch: int, state, extra: Optional[Dict[str, Any]] = None) -> None:
        tree = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "epoch": epoch,
        }
        if extra:
            tree.update(extra)
        self.manager.save(epoch, args=ocp.args.StandardSave(tree))
        self.manager.wait_until_finished()

    def latest_epoch(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, state, epoch: Optional[int] = None):
        """Restore into the structure of ``state``; returns (state, epoch)."""
        if epoch is None:
            epoch = self.latest_epoch()
        if epoch is None:
            return state, None
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "epoch": 0,
        }
        restored = self.manager.restore(epoch, args=ocp.args.StandardRestore(template))
        state = state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
        )
        return state, restored["epoch"]


def restore_or_die(path: str, state):
    """Restore a checkpoint into ``state``: an orbax ckpt directory, the
    train-CLI log dir containing a ``ckpt/`` subdir, or a ``.pth`` file
    (reference format, via the torch bridge below).

    Returns (state, epoch, resolved_path); raises SystemExit if nothing
    restores — silently continuing with random weights is never what the
    caller wants (shared by the four train/test CLIs). Probing never creates
    directories (a typo'd --resume must not leave an empty ckpt dir behind).
    """
    if os.path.isfile(path):
        if not path.endswith(".pth"):
            raise SystemExit(
                f"--resume {path}: is a file but not a .pth checkpoint"
            )
        params, batch_stats, epoch, _ = load_pth(path, state.params, state.batch_stats)
        return state.replace(params=params, batch_stats=batch_stats), epoch, path
    if os.path.isdir(path):
        state2, epoch = CheckpointIO(path).restore(state)
        if epoch is None and os.path.isdir(os.path.join(path, "ckpt")):
            path = os.path.join(path, "ckpt")
            state2, epoch = CheckpointIO(path).restore(state)
        if epoch is not None:
            return state2, epoch, path
    raise SystemExit(
        f"--resume {path}: no checkpoint found (pass the ckpt dir, the "
        "train-CLI log dir containing it, or a .pth file)"
    )


# ---------------------------------------------------------------------------
# torch .pth bridge
# ---------------------------------------------------------------------------

# (regex on the flax leaf path, torch suffix, layout transform tag)
_KEY_RULES = (
    # fused detection heads (models/backbone.py DetectionHeads): separate
    # cls/reg params exported under torch-style conv module names
    (re.compile(r"(.*)/cls_kernel$"), "cls.weight", "kernel"),
    (re.compile(r"(.*)/cls_bias$"), "cls.bias", None),
    (re.compile(r"(.*)/reg_kernel$"), "reg.weight", "kernel"),
    (re.compile(r"(.*)/reg_bias$"), "reg.bias", None),
    (re.compile(r"(.*)/kernel$"), "weight", "kernel"),
    (re.compile(r"(.*)/bias$"), "bias", None),
    (re.compile(r"(.*)/scale$"), "weight", None),  # BatchNorm scale
    (re.compile(r"(.*)/mean$"), "running_mean", None),
    (re.compile(r"(.*)/var$"), "running_var", None),
)


def _flatten(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}/{k}" if prefix else str(k)))
    else:
        out[prefix] = np.asarray(tree)
    return out


def _to_torch_name_and_value(path: str, value: np.ndarray):
    for rx, suffix, tag in _KEY_RULES:
        m = rx.match(path)
        if m:
            base = m.group(1).replace("/", ".")
            if tag == "kernel":
                if value.ndim == 4:  # HWIO -> OIHW
                    value = np.transpose(value, (3, 2, 0, 1))
                elif value.ndim == 2:  # (in, out) -> (out, in)
                    value = value.T
            return f"{base}.{suffix}", value
    return path.replace("/", "."), value


def _from_torch_value(flax_path: str, value: np.ndarray) -> np.ndarray:
    if flax_path.endswith("kernel"):  # kernel / cls_kernel / reg_kernel
        if value.ndim == 4:  # OIHW -> HWIO
            return np.transpose(value, (2, 3, 1, 0))
        if value.ndim == 2:
            return value.T
    return value


def state_dict_from_tree(params, batch_stats=None) -> Dict[str, np.ndarray]:
    """flax trees -> torch-style flat state_dict (numpy values)."""
    flat = _flatten({"params": params, "batch_stats": batch_stats or {}})
    out = {}
    for path, val in flat.items():
        # strip the collection prefix: torch has one flat namespace
        stripped = re.sub(r"^(params|batch_stats)/", "", path)
        name, v = _to_torch_name_and_value(stripped, val)
        # BatchNorm stats and scale collide at 'weight' only if a module has
        # both a Conv kernel and a BN scale at the same path — flax scopes them
        # differently (Conv_0 vs BatchNorm_0) so names stay unique.
        out[name] = v
    return out


def save_pth(path: str, state, epoch: int, loss: float = 0.0) -> None:
    """Export the reference checkpoint dict format (SURVEY.md §5.5)."""
    import torch

    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v.astype(np.float32)))
        for k, v in state_dict_from_tree(state.params, state.batch_stats).items()
    }
    torch.save(
        {
            "epoch": int(epoch),
            "model_state_dict": sd,
            "optimizer_state_dict": {},  # optax state is not torch-Adam shaped
            "loss": float(loss),
        },
        path,
    )


def load_pth(path: str, params_template, batch_stats_template=None) -> Tuple[Any, Any, int, float]:
    """Load a .pth checkpoint into flax trees shaped like the templates.

    Matches by the deterministic name mapping above; raises on missing keys so
    silent partial loads can't fake parity.
    """
    import torch

    # the export is a plain tensor state_dict; weights_only avoids executing
    # pickled code from an untrusted reference-format .pth (ADVICE r2)
    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = ckpt.get("model_state_dict", ckpt)
    sd = {k: v.detach().cpu().numpy() for k, v in sd.items()}

    def rebuild(template, collection):
        flat = _flatten({collection: template})
        out = {}
        for path_, val in flat.items():
            stripped = re.sub(r"^(params|batch_stats)/", "", path_)
            name, _ = _to_torch_name_and_value(stripped, val)
            if name not in sd:
                raise KeyError(f"checkpoint missing '{name}' (for {path_})")
            out[path_] = _from_torch_value(stripped, sd[name]).astype(val.dtype).reshape(val.shape)
        # unflatten
        tree: Dict[str, Any] = {}
        for path_, val in out.items():
            parts = path_.split("/")[1:]  # drop collection
            node = tree
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = val
        return tree

    params = rebuild(params_template, "params")
    batch_stats = (
        rebuild(batch_stats_template, "batch_stats") if batch_stats_template else {}
    )
    return params, batch_stats, int(ckpt.get("epoch", 0)), float(ckpt.get("loss", 0.0))
