"""Name-based model registry.

Mirrors the reference's ``models.__dict__[name](data, no_levels=N)`` lookup
(reference models/__init__.py:1-6, Train_Stage1_K.py:171) including the
reference's own factory names, so configs and checkpoints that carry a
model class name keep working.
"""

from __future__ import annotations

from typing import Callable, Dict

from fal_net_tpu.models.falnet import FalNet, create_model

_FACTORIES: Dict[str, Callable[..., FalNet]] = {}


def register(name: str, factory: Callable[..., FalNet]) -> None:
    _FACTORIES[name] = factory


def get(name: str, num_levels: int | None = None, **kw) -> FalNet:
    if name not in _FACTORIES:
        raise KeyError(f"unknown model {name!r}; have {sorted(_FACTORIES)}")
    return _FACTORIES[name](num_levels=num_levels, **kw)


def names() -> list[str]:
    return sorted(_FACTORIES)


for _variant, _names in {
    "A": ("A", "FAL_netA", "falnet_a"),
    "B": ("B", "FAL_netB", "falnet_b"),
    "C": ("C", "FAL_netC", "falnet_c"),
}.items():
    for _n in _names:
        register(_n, (lambda v: lambda num_levels=None, **kw: create_model(v, num_levels, **kw))(_variant))
