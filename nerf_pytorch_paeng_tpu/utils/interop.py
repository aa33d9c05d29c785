"""Checkpoint interop with the reference PyTorch implementation.

The reference saves ``{'idx', 'model_state_dict', 'optimizer_state_dict'}``
via ``torch.save`` (reference train.py:105-114) and resumes with
``load_state_dict`` (reference main.py:111-116).  This module maps that
format to/from our pytree ``TrainState`` so a user can

- **import** a reference ``*.pth.tar`` and keep training / evaluating on
  TPU (``tools/import_reference_ckpt.py``), Adam moments included — the
  optimizer continues exactly where the torch run left off; and
- **export** a TPU-trained orbax checkpoint back to the reference format
  (``tools/export_reference_ckpt.py``) for tooling that expects it.

Everything here is numpy-only: callers convert torch tensors with
``.numpy()`` (the CLI tools do).  Layer-name mapping (ours <-> reference
model/NeRF.py:24-30):

  trunk_0..7 <-> linear_x.0..7      (kernel = weight.T)
  view       <-> linear_d
  feature    <-> linear_feat
  density    <-> linear_density
  color      <-> linear_color

prefixed ``model_coarse.`` / ``model_fine.`` (reference model/NeRF.py:58-59).
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import numpy as np

# (ours, reference) layer-name pairs in the reference's nn.Module
# registration order — the order torch's state_dict / parameters() walk,
# which is also the param-index order inside optimizer_state_dict.
LAYER_PAIRS: List[Tuple[str, str]] = (
    [(f"trunk_{i}", f"linear_x.{i}") for i in range(8)]
    + [("view", "linear_d"), ("feature", "linear_feat"),
       ("density", "linear_density"), ("color", "linear_color")])

MODULE_PAIRS = [("coarse", "model_coarse"), ("fine", "model_fine")]


def reference_param_keys() -> List[str]:
    """The reference model_state_dict keys in registration order."""
    keys = []
    for _, ref_mod in MODULE_PAIRS:
        for _, ref_layer in LAYER_PAIRS:
            keys.append(f"{ref_mod}.{ref_layer}.weight")
            keys.append(f"{ref_mod}.{ref_layer}.bias")
    return keys


def params_from_reference_state_dict(sd: Dict[str, np.ndarray]) -> Any:
    """Reference ``model_state_dict`` (numpy leaves) -> our params tree.

    Torch Linear stores weight as [out, in]; our kernels are [in, out]."""
    params = {}
    for ours_mod, ref_mod in MODULE_PAIRS:
        mlp = {}
        for ours_layer, ref_layer in LAYER_PAIRS:
            w = np.asarray(sd[f"{ref_mod}.{ref_layer}.weight"], np.float32)
            b = np.asarray(sd[f"{ref_mod}.{ref_layer}.bias"], np.float32)
            mlp[ours_layer] = {"kernel": w.T.copy(), "bias": b}
        params[ours_mod] = mlp
    return params


def reference_state_dict_from_params(params: Any) -> Dict[str, np.ndarray]:
    """Our params tree -> reference ``model_state_dict`` (numpy leaves),
    keys in the reference's registration order."""
    sd: Dict[str, np.ndarray] = {}
    for ours_mod, ref_mod in MODULE_PAIRS:
        mlp = params[ours_mod]
        for ours_layer, ref_layer in LAYER_PAIRS:
            sd[f"{ref_mod}.{ref_layer}.weight"] = (
                np.asarray(mlp[ours_layer]["kernel"], np.float32).T.copy())
            sd[f"{ref_mod}.{ref_layer}.bias"] = (
                np.asarray(mlp[ours_layer]["bias"], np.float32))
    return sd


def _moment_trees(opt_sd: Dict[str, Any], params: Any
                  ) -> Tuple[Any, Any, int]:
    """Torch Adam ``optimizer_state_dict`` -> (mu, nu, step) in OUR param
    tree layout.  Torch keys per-param state by index into parameters()
    order, which equals the state_dict key order (no buffers in the
    reference model).  Torch only materialises per-param state at the
    first grad; a param that never trained continues from zero moments
    (shapes taken from ``params``)."""
    state = opt_sd["state"]
    keys = reference_param_keys()
    mu_sd = {}
    nu_sd = {}
    step = 0
    for idx, key in enumerate(keys):
        s = state.get(idx)
        if s is None:
            continue
        mu_sd[key] = np.asarray(s["exp_avg"], np.float32)
        nu_sd[key] = np.asarray(s["exp_avg_sq"], np.float32)
        step = max(step, int(np.asarray(s["step"])))
    full = reference_state_dict_from_params(params)
    for key in keys:
        if key not in mu_sd:
            mu_sd[key] = np.zeros_like(full[key])
            nu_sd[key] = np.zeros_like(full[key])
    return (params_from_reference_state_dict(mu_sd),
            params_from_reference_state_dict(nu_sd), step)


def train_state_from_reference_checkpoint(ckpt: Dict[str, Any], cfg):
    """Full import: reference checkpoint dict (numpy leaves) -> TrainState.

    ``ckpt`` is ``{'idx', 'model_state_dict', 'optimizer_state_dict'}``
    with tensors already converted to numpy.  The Adam first/second
    moments and step count transfer into the optax state, so bias
    correction and the LR schedule continue exactly where the reference
    run stopped; if the optimizer state is absent the moments start
    fresh (params-only import — fine for eval/render)."""
    import jax.numpy as jnp
    import optax

    from ..train.state import TrainState, make_optimizer

    params = params_from_reference_state_dict(ckpt["model_state_dict"])
    params = jax.tree_util.tree_map(jnp.asarray, params)
    idx = int(ckpt.get("idx", 0))

    tx = make_optimizer(cfg)
    opt_state = tx.init(params)

    opt_sd = ckpt.get("optimizer_state_dict")
    if opt_sd and opt_sd.get("state"):
        mu, nu, opt_step = _moment_trees(opt_sd, params)
        if idx == 0:
            idx = opt_step
        count = jnp.asarray(idx, jnp.int32)

        def put(leaf_state):
            # replace every ScaleByAdamState in the chain (optax.adam has
            # exactly one); count also feeds the schedule wrapper states
            if hasattr(leaf_state, "mu") and hasattr(leaf_state, "nu"):
                return leaf_state._replace(
                    count=count,
                    mu=jax.tree_util.tree_map(jnp.asarray, mu),
                    nu=jax.tree_util.tree_map(jnp.asarray, nu))
            if hasattr(leaf_state, "count"):
                return leaf_state._replace(count=count)
            return leaf_state

        opt_state = tuple(put(s) for s in opt_state)
    return TrainState(jax.numpy.asarray(idx, jax.numpy.int32), params,
                      opt_state)


def reference_checkpoint_from_train_state(state, cfg) -> Dict[str, Any]:
    """Full export: TrainState -> reference checkpoint dict (numpy
    leaves; the CLI tool tensor-ifies and torch.saves it).

    The optimizer_state_dict mirrors torch.optim.Adam's: per-param
    ``{step, exp_avg, exp_avg_sq}`` keyed by parameters() index, plus one
    param_group carrying the reference's hyperparameters (main.py:79)."""
    import numpy as np

    sd = reference_state_dict_from_params(state.params)
    idx = int(np.asarray(state.step))

    # find the ScaleByAdamState in the optax chain
    adam = next((s for s in state.opt_state
                 if hasattr(s, "mu") and hasattr(s, "nu")), None)
    opt_sd: Dict[str, Any] = {}
    if adam is not None:
        mu_sd = reference_state_dict_from_params(adam.mu)
        nu_sd = reference_state_dict_from_params(adam.nu)
        keys = reference_param_keys()
        opt_sd = {
            "state": {i: {"step": np.asarray(float(idx)),
                          "exp_avg": mu_sd[k], "exp_avg_sq": nu_sd[k]}
                      for i, k in enumerate(keys)},
            "param_groups": [{
                "params": list(range(len(keys))),
                "lr": float(cfg.lr), "betas": (0.9, 0.999), "eps": 1e-8,
                "weight_decay": 0, "amsgrad": False, "maximize": False,
                "foreach": None, "capturable": False,
                "differentiable": False, "fused": None,
            }],
        }
    return {"idx": idx, "model_state_dict": sd,
            "optimizer_state_dict": opt_sd}
