"""Import reference PyTorch checkpoints into fal_net_tpu parameter pytrees.

Reference checkpoints are dicts ``{'epoch', 'm_model', 'state_dict',
'best_rmse'}`` (Train_Stage1_K.py:202-207) whose ``state_dict`` keys follow
the torch module tree.  Layout notes:

  * conv weights are OIHW -> transposed to HWIO for flax.
  * ``conv_elu`` is an nn.Sequential, so its conv is key ``<name>.0``.
  * the backbone attribute is named ``BackBone`` (A), ``backbone`` (B) or
    ``synth`` (C) — models/FAL_netA.py:182, FAL_netB.py:184, FAL_netC.py:185.
  * ``DataParallel`` training wraps keys with a ``module.`` prefix.

torch is only required inside :func:`load_torch_checkpoint`; the mapping
itself operates on numpy arrays so tests can exercise it torch-free.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from fal_net_tpu.models.backbone import VariantSpec, VARIANTS


def _oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def detect_variant(state_dict: Mapping[str, Any]) -> VariantSpec:
    keys = {k.split(".")[0] for k in state_dict}
    for spec in VARIANTS.values():
        if spec.torch_backbone_key in keys:
            return spec
    raise ValueError(
        f"cannot detect FAL-net variant from state_dict roots {sorted(keys)}"
    )


def strip_data_parallel(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in state_dict.items()
    }


def convert_state_dict(
    state_dict: Mapping[str, np.ndarray],
    spec: VariantSpec | None = None,
) -> Dict[str, Any]:
    """Map a reference state_dict (numpy values, OIHW) to flax params."""
    sd = strip_data_parallel(state_dict)
    sd = {k: np.asarray(v) for k, v in sd.items()}
    if spec is None:
        spec = detect_variant(sd)
    bk = spec.torch_backbone_key

    backbone: Dict[str, Any] = {}

    def conv_elu(flax_name: str, torch_name: str) -> None:
        backbone[flax_name] = {
            "conv": {
                "kernel": _oihw_to_hwio(sd[f"{bk}.{torch_name}.0.weight"]),
                "bias": sd[f"{bk}.{torch_name}.0.bias"],
            }
        }

    def residual(flax_name: str, torch_name: str) -> None:
        backbone[flax_name] = {
            "conv1": {"kernel": _oihw_to_hwio(sd[f"{bk}.{torch_name}.conv1.weight"])},
            "conv2": {"kernel": _oihw_to_hwio(sd[f"{bk}.{torch_name}.conv2.weight"])},
        }

    def deconv(flax_name: str, torch_name: str) -> None:
        backbone[flax_name] = {
            "conv": {"kernel": _oihw_to_hwio(sd[f"{bk}.{torch_name}.conv1.weight"])}
        }

    conv_elu("conv0", "conv0")
    residual("rb0", "conv0_1")
    for i in range(1, 7):
        conv_elu(f"conv{i}", f"conv{i}")
        residual(f"rb{i}", f"conv{i}_1")
    for j in range(6, 1, -1):
        deconv(f"deconv{j}", f"deconv{j}")
        conv_elu(f"iconv{j}", f"iconv{j}")
    deconv("deconv1", "deconv1")
    backbone["iconv1"] = {"kernel": _oihw_to_hwio(sd[f"{bk}.iconv1.weight"])}

    if spec.has_amask:
        backbone["amask_conv1_kernel"] = _oihw_to_hwio(sd[f"{bk}.amask_conv.0.weight"])
        backbone["amask_conv1_bias"] = sd[f"{bk}.amask_conv.0.bias"]
        backbone["amask_conv2_kernel"] = _oihw_to_hwio(sd[f"{bk}.amask_conv.2.weight"])

    params = {
        "backbone": backbone,
        "logits_1x1": {
            "kernel": _oihw_to_hwio(sd["conv0.weight"]),
            "bias": sd["conv0.bias"],
        },
    }
    return params


def load_torch_checkpoint(path: str) -> tuple[Dict[str, Any], str, int]:
    """Load a reference ``checkpoint.pth.tar``.

    Returns (flax_params, reference_model_name, num_levels).  The model
    class name travels inside the checkpoint (Train_Stage1_K.py:163-166).
    """
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = data["state_dict"] if "state_dict" in data else data
    state_dict = {k: v.numpy() for k, v in strip_data_parallel(state_dict).items()}
    spec = detect_variant(state_dict)
    num_levels = state_dict["conv0.weight"].shape[0]
    params = convert_state_dict(state_dict, spec)
    name = data.get("m_model", spec.torch_name) if isinstance(data, dict) else spec.torch_name
    return params, name, num_levels
