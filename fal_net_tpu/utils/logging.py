"""Run logging: settings dump, JSONL scalar stream, optional TensorBoard.

Capability parity with the reference's observability (SURVEY §5):
``settings.txt`` config dump (Train_Stage1_K.py:73-85), per-step stdout, and
scalar/image writers.  TensorBoard is used when the ``tensorboardX`` or
``tensorboard`` package is importable; the JSONL stream is always written so
runs are inspectable without either.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Dict


def dump_settings(save_path: str, cfg: Any) -> None:
    os.makedirs(save_path, exist_ok=True)
    if dataclasses.is_dataclass(cfg):
        items = dataclasses.asdict(cfg)
    elif isinstance(cfg, dict):
        items = cfg
    else:
        items = vars(cfg)
    lines = ["-------TRAINING SETTINGS---------"]
    lines += [f"{k:>15s}: {v}" for k, v in sorted(items.items())]
    text = "\n".join(lines)
    print(text)
    with open(os.path.join(save_path, "settings.txt"), "w") as f:
        f.write(text + "\n")


class MetricsLogger:
    def __init__(self, save_path: str, name: str = "metrics"):
        os.makedirs(save_path, exist_ok=True)
        self._f = open(os.path.join(save_path, f"{name}.jsonl"), "a")
        self._tb = None
        try:
            from tensorboardX import SummaryWriter  # type: ignore

            self._tb = SummaryWriter(os.path.join(save_path, "tb"))
        except ImportError:
            try:
                from torch.utils.tensorboard import SummaryWriter  # type: ignore

                self._tb = SummaryWriter(os.path.join(save_path, "tb"))
            except Exception:
                self._tb = None

    def scalars(self, step: int, values: Dict[str, Any], prefix: str = "") -> None:
        rec = {"step": int(step), "time": time.time()}
        for k, v in values.items():
            key = f"{prefix}{k}"
            rec[key] = float(v)
            if self._tb is not None:
                self._tb.add_scalar(key, float(v), int(step))
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def image(self, step: int, tag: str, image_hwc) -> None:
        if self._tb is not None:
            import numpy as np

            arr = np.asarray(image_hwc)
            self._tb.add_image(tag, arr, int(step), dataformats="HWC")

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()
