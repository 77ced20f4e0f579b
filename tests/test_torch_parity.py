"""Torch-twin forward parity (SURVEY.md §5.5, VERDICT r1 #2).

The reference's released checkpoints are ``.pth`` files; the rebuild's bridge
(``training/checkpoint.py``) must therefore agree with a real torch model on
BOTH the key naming and the forward semantics. ``disconet_tpu/compat/torch_ref``
re-implements the reference FaFNet/DiscoNet in torch-CPU from the SURVEY spec;
these tests export the JAX model with ``save_pth``, load it into the twin with
``strict`` key checking, and assert eval-mode forward parity ≤1e-4 on random
BEVs — covering conv padding (incl. stride-2 alignment), nearest upsample,
BatchNorm eval stats + momentum, affine_grid/grid_sample warping, the fusion
scorer, and the per-pixel sender softmax in one cross-framework contract.

Runs everything in float32 (``compute_dtype='float32'``): the rebuild's bf16
MXU path is a measured-on-TPU performance choice, not a semantics change.
"""

import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from disconet_tpu.config import tiny_config

torch = pytest.importorskip("torch")

CFG = tiny_config(64, compute_dtype="float32")
B, A = 1, 3


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    H, W = CFG.map_dims
    Z = CFG.grid_size[2]
    bev = (rng.random((B, A, H, W, Z)) < 0.05).astype(np.float32)
    # non-trivial relative poses: translations up to 2 m, rotations up to 30 deg
    trans = np.tile(np.eye(4, dtype=np.float32), (B, A, A, 1, 1))
    for b in range(B):
        for i in range(A):
            for j in range(A):
                if i == j:
                    continue
                th = rng.uniform(-0.5, 0.5)
                c, s = np.cos(th), np.sin(th)
                trans[b, i, j][:2, :2] = [[c, -s], [s, c]]
                trans[b, i, j][:2, 3] = rng.uniform(-2.0, 2.0, 2)
    mask = np.ones((B, A), bool)
    mask[0, A - 1] = False  # one absent agent: masking must agree too
    return bev, trans, mask


def _warm_bn(model, variables, bev, trans, mask, n=2):
    """A couple of train-mode applies so running BN stats are non-trivial —
    catches momentum/naming bugs that an init-state (mean 0, var 1) export
    would hide."""
    params, stats = variables["params"], variables.get("batch_stats", {})
    for _ in range(n):
        _, upd = model.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(bev), jnp.asarray(trans), jnp.asarray(mask),
            train=True, mutable=["batch_stats"],
        )
        stats = upd["batch_stats"]
    return params, stats


def _export(tmp_path, params, stats):
    from disconet_tpu.training.checkpoint import save_pth

    path = str(tmp_path / "twin.pth")
    state = types.SimpleNamespace(params=params, batch_stats=stats)
    save_pth(path, state, epoch=1)
    return path


def _assert_close(jax_out, torch_out, mask, what):
    got = np.asarray(torch_out.detach().numpy())
    want = np.asarray(jax_out)
    for b in range(B):
        for a in range(A):
            if not mask[b, a]:
                continue  # reference never computes absent agents
            np.testing.assert_allclose(
                got[b, a], want[b, a], atol=1e-4, rtol=1e-4,
                err_msg=f"{what} agent {a}",
            )


def test_fafnet_pth_forward_parity(tmp_path):
    from disconet_tpu.compat import FaFNetTorch, load_pth_into_torch
    from disconet_tpu.models import build_model

    bev, trans, mask = _inputs(0)
    model = build_model("", CFG)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(bev),
                           jnp.asarray(trans), jnp.asarray(mask), train=False)
    params, stats = _warm_bn(model, variables, bev, trans, mask)
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(bev), jnp.asarray(trans), jnp.asarray(mask),
                      train=False)

    twin = load_pth_into_torch(FaFNetTorch(CFG), _export(tmp_path, params, stats))
    with torch.no_grad():
        cls_t, reg_t = twin(torch.from_numpy(bev))
    _assert_close(out["cls"], cls_t, mask, "cls")
    _assert_close(out["reg"], reg_t, mask, "reg")


def test_disconet_pth_forward_parity(tmp_path):
    from disconet_tpu.compat import DiscoNetTorch, load_pth_into_torch
    from disconet_tpu.models import build_model

    bev, trans, mask = _inputs(1)
    model = build_model("disco", CFG)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(bev),
                           jnp.asarray(trans), jnp.asarray(mask), train=False)
    params, stats = _warm_bn(model, variables, bev, trans, mask)
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(bev), jnp.asarray(trans), jnp.asarray(mask),
                      train=False)

    twin = load_pth_into_torch(DiscoNetTorch(CFG, layer=3), _export(tmp_path, params, stats))
    with torch.no_grad():
        cls_t, reg_t = twin(torch.from_numpy(bev), trans, mask)
    _assert_close(out["cls"], cls_t, mask, "cls")
    _assert_close(out["reg"], reg_t, mask, "reg")


def test_v2vnet_pth_forward_parity(tmp_path):
    """ConvGRU message passing incl. per-round re-warps, cross-framework."""
    from disconet_tpu.compat import V2VNetTorch, load_pth_into_torch
    from disconet_tpu.models import build_model

    bev, trans, mask = _inputs(3)
    model = build_model("v2v", CFG)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(bev),
                           jnp.asarray(trans), jnp.asarray(mask), train=False)
    params, stats = _warm_bn(model, variables, bev, trans, mask)
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(bev), jnp.asarray(trans), jnp.asarray(mask),
                      train=False)

    twin = load_pth_into_torch(V2VNetTorch(CFG, layer=3), _export(tmp_path, params, stats))
    with torch.no_grad():
        cls_t, reg_t = twin(torch.from_numpy(bev), trans, mask)
    _assert_close(out["cls"], cls_t, mask, "cls")
    _assert_close(out["reg"], reg_t, mask, "reg")


@pytest.mark.parametrize("com,warp_flag", [
    ("when2com", True),
    ("when2com", False),   # the reference's no-warp value variant
    ("who2com", True),     # hard_select argmax at inference
])
def test_when2com_pth_forward_parity(tmp_path, com, warp_flag):
    from disconet_tpu.compat import When2comTorch, load_pth_into_torch
    from disconet_tpu.models import build_model

    bev, trans, mask = _inputs(4)
    model = build_model(com, CFG, warp_flag=warp_flag)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(bev),
                           jnp.asarray(trans), jnp.asarray(mask), train=False)
    params, stats = _warm_bn(model, variables, bev, trans, mask)
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(bev), jnp.asarray(trans), jnp.asarray(mask),
                      train=False)

    twin = When2comTorch(CFG, layer=3, warp_flag=warp_flag,
                         hard_select=(com == "who2com"))
    twin = load_pth_into_torch(twin, _export(tmp_path, params, stats))
    with torch.no_grad():
        cls_t, reg_t = twin(torch.from_numpy(bev), trans, mask)
    _assert_close(out["cls"], cls_t, mask, "cls")
    _assert_close(out["reg"], reg_t, mask, "reg")


@pytest.mark.parametrize("com", ["cat", "agent"])
def test_naive_fusion_pth_forward_parity(tmp_path, com):
    """The two naive fusions with their own parameters (CatFusion's slot-order
    concat projection; AgentWiseWeightedFusion's pooled scalar sender weights)
    — completes cross-framework parity for every parameterized model family."""
    from disconet_tpu.compat import (
        AgentWiseWeightedFusionTorch, CatFusionTorch, load_pth_into_torch)
    from disconet_tpu.models import build_model

    bev, trans, mask = _inputs(6)
    model = build_model(com, CFG)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(bev),
                           jnp.asarray(trans), jnp.asarray(mask), train=False)
    params, stats = _warm_bn(model, variables, bev, trans, mask)
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(bev), jnp.asarray(trans), jnp.asarray(mask),
                      train=False)

    twin = (CatFusionTorch(CFG, num_slots=A, layer=3) if com == "cat"
            else AgentWiseWeightedFusionTorch(CFG, layer=3))
    twin = load_pth_into_torch(twin, _export(tmp_path, params, stats))
    with torch.no_grad():
        cls_t, reg_t = twin(torch.from_numpy(bev), trans, mask)
    _assert_close(out["cls"], cls_t, mask, "cls")
    _assert_close(out["reg"], reg_t, mask, "reg")


def test_twin_rejects_renamed_keys(tmp_path):
    """strict loading is the contract: a renamed key must fail loudly."""
    from disconet_tpu.compat import FaFNetTorch, load_pth_into_torch
    from disconet_tpu.models import build_model

    bev, trans, mask = _inputs(2)
    model = build_model("", CFG)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(bev),
                           jnp.asarray(trans), jnp.asarray(mask), train=False)
    path = _export(tmp_path, variables["params"], variables.get("batch_stats", {}))
    ckpt = torch.load(path, weights_only=False)
    sd = ckpt["model_state_dict"]
    sd["stpn.stages_0.ConvBNRelu_0.weights"] = sd.pop("stpn.stages_0.ConvBNRelu_0.weight")
    torch.save(ckpt, path)
    with pytest.raises(KeyError):
        load_pth_into_torch(FaFNetTorch(CFG), path)
