"""Network registry.

Replaces the reference's importlib auto-scan of `models/archs/*_arch.py`
(`models/modules.py:17-41`, `define_G` :86-92) with an explicit registry
keyed by the same `--net_name` strings.
"""
from __future__ import annotations

from typing import Any, Callable, Dict

from .lsid import LSID
from .noisediff_net import NoiseDiffNet
from .others import UNet_PosEmbV2, UNet_PosEmbV2_CameraCond, UNet_PosEmbV2_NoPosition

_REGISTRY: Dict[str, Callable[..., Any]] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


@register("NoiseDiffNet")
def _noisediff(cfg, dtype=None):
    return NoiseDiffNet(
        dim=cfg.dim, channels=cfg.inp_dim, dtype=dtype,
        remat=getattr(cfg, "remat", False),
    )


@register("UNet_PosEmbV2")
def _posembv2(cfg, dtype=None):
    return UNet_PosEmbV2(dim=cfg.dim, channels=cfg.inp_dim, cond_dim=cfg.cond_dim, dtype=dtype)


@register("UNet_PosEmbV2_NoPosition")
def _posembv2_nopos(cfg, dtype=None):
    return UNet_PosEmbV2_NoPosition(dim=cfg.dim, channels=cfg.inp_dim, cond_dim=cfg.cond_dim, dtype=dtype)


@register("UNet_PosEmbV2_CameraCond")
def _posembv2_cam(cfg, dtype=None):
    return UNet_PosEmbV2_CameraCond(dim=cfg.dim, channels=cfg.inp_dim, cond_dim=cfg.cond_dim, dtype=dtype)


@register("LSID")
def _lsid(cfg, dtype=None):
    # lsid_width: framework extension (default 32 = the reference
    # architecture); reduced widths serve bounded-budget runs like the
    # closed-loop learning gate (scripts/learning_gate.py).
    return LSID(dtype=dtype, base_width=getattr(cfg, "lsid_width", 32))


def define_network(net_name: str, cfg, dtype=None):
    """Instantiate a network by its reference CLI name (`--net_name`)."""
    if net_name not in _REGISTRY:
        raise ValueError(
            f"{net_name} is not found. Available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[net_name](cfg, dtype=dtype)


__all__ = [
    "LSID",
    "NoiseDiffNet",
    "UNet_PosEmbV2",
    "UNet_PosEmbV2_NoPosition",
    "UNet_PosEmbV2_CameraCond",
    "define_network",
    "register",
]
