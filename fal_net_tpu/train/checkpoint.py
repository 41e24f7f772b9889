"""Checkpoint IO.

Native format: flax msgpack bytes + a JSON sidecar with
``{step, epoch, model_name, num_levels, best_metric, best_value}`` — the
reference's checkpoint payload (Train_Stage1_K.py:202-207) plus optimizer
state (a documented reference gap).  ``model_best`` copy semantics
preserved: best = lowest view-synthesis RMSE on the validation set, not
best depth metric (Train_Stage1_K.py:191-207); the reference-compatible
``best_rmse`` key is written only when the selection metric really is that
RMSE (with no val set, selection falls back to the epoch train loss and
the sidecar says ``best_metric: train_loss``).

Reference ``*.pth.tar`` checkpoints load transparently through
:mod:`fal_net_tpu.models.torch_import`.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
from flax import serialization

CKPT_NAME = "checkpoint.msgpack"
BEST_NAME = "model_best.msgpack"
META_NAME = "checkpoint.json"


def save_checkpoint(
    save_dir: str,
    target: Any,
    meta: Dict[str, Any],
    is_best: bool = False,
) -> str:
    os.makedirs(save_dir, exist_ok=True)
    path = os.path.join(save_dir, CKPT_NAME)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(target)))
    with open(os.path.join(save_dir, META_NAME), "w") as f:
        json.dump(meta, f, indent=2, default=float)
    if is_best:
        shutil.copyfile(path, os.path.join(save_dir, BEST_NAME))
    return path


def load_checkpoint(path: str, target: Any) -> Tuple[Any, Dict[str, Any]]:
    """Load a native checkpoint (file or directory) into ``target``'s pytree."""
    if os.path.isdir(path):
        path = os.path.join(path, CKPT_NAME)
    with open(path, "rb") as f:
        restored = serialization.from_bytes(target, f.read())
    meta: Dict[str, Any] = {}
    meta_path = os.path.join(os.path.dirname(path), META_NAME)
    if os.path.isfile(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return restored, meta


def load_params_any(path: str) -> Tuple[Dict[str, Any], Optional[str], Optional[int]]:
    """Load model params from either a native checkpoint or a reference
    torch ``*.pth.tar`` (detected by extension).

    Native msgpack files are identified by *structure*, not guessed:
      * a serialized TrainState  — root has both 'params' and 'opt_state';
      * a flax variables dict    — root has a 'params' collection;
      * a bare inner params dict — root has the 'backbone' module.
    Anything else raises ``ValueError`` instead of silently mis-loading.
    Returns ``(variables, model_name, num_levels)`` with variables in the
    canonical ``{'params': {...}}`` form.
    """
    if path.endswith((".pth", ".pth.tar", ".pt", ".tar")):
        from fal_net_tpu.models.torch_import import load_torch_checkpoint

        params, name, num_levels = load_torch_checkpoint(path)
        return {"params": params}, name, num_levels
    # native: params-only restore (structure-free via msgpack dict decode)
    with open(path if not os.path.isdir(path) else os.path.join(path, CKPT_NAME), "rb") as f:
        tree = serialization.msgpack_restore(f.read())
    meta_path = os.path.join(
        path if os.path.isdir(path) else os.path.dirname(path), META_NAME
    )
    name = num_levels = None
    if os.path.isfile(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        name = meta.get("model_name")
        num_levels = meta.get("num_levels")

    def _as_variables(node):
        if not isinstance(node, dict):
            return None
        if "params" in node and isinstance(node["params"], dict):
            return node  # flax variables dict
        if "backbone" in node:
            return {"params": node}  # bare inner params dict
        return None

    if isinstance(tree, dict) and "opt_state" in tree and "params" in tree:
        variables = _as_variables(tree["params"])  # serialized TrainState
    else:
        variables = _as_variables(tree)
    if variables is None:
        keys = sorted(tree) if isinstance(tree, dict) else type(tree).__name__
        raise ValueError(
            f"unrecognized checkpoint structure in {path!r}: root keys {keys}; "
            "expected a TrainState ('params'+'opt_state'), a flax variables "
            "dict ('params'), or a bare params dict ('backbone')"
        )
    return variables, name, num_levels
