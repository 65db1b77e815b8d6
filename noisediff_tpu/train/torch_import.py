"""Import reference torch checkpoints into the flax param trees.

Parity target: the reference's pretrained artefacts
(pretrained_ckpts/{DiffusionNet,NoiseDiff,NoiseDiffStar}_ckpt.pth,
README.md:30-41) and its load semantics (trainer_diffusion.py:333-349):
'module.' DDP prefixes are stripped, then a strict key match.

The mapper translates every flax parameter path to the corresponding torch
state_dict key and applies the layout transform:

  conv kernels        OIHW -> HWIO                (transpose 2,3,1,0)
  conv-transpose      (in,out,kh,kw) -> HWIO-like (transpose 2,3,0,1)
  linear kernels      (out,in) -> (in,out)        (transpose)
  norm scale          weight
  embedding           weight

Wrapper-module path segments introduced by the flax blocks (Conv->conv,
Dense->dense, GroupNorm->norm) collapse away; Sequential indices on the
torch side ('time_mlp.1', 'ff.net.0.0', 'downs.i.3.1', 'mlp.1',
'attn.to_out.0') are reintroduced by name rules. tests/test_torch_import.py
pins the full 416-key NoiseDiffNet and 42-key LSID mappings against fixture
key lists dumped from the reference models.
"""
from __future__ import annotations

import re
from typing import Dict, Tuple

import jax
import numpy as np

# flax segment -> torch segment (None = drop the segment)
_NAME_RULES = {
    "lin1": "1",  # TimeMlp Sequential: [sinu, Linear, GELU, Linear]
    "lin2": "3",
    "sinu": None,
    "proj_in": "net.0.0",  # FeedForward: Sequential(Sequential(Linear,GELU),Dropout,Linear)
    "proj_out_ff": "net.2",
}

_STAGE_RE = re.compile(r"^(downs|ups)_(\d+)_(block1|block2|attn|down|up)$")
_STAGE_SLOT = {"block1": "0", "block2": "1", "attn": "2", "down": "3", "up": "3"}

# torch ConvTranspose2d modules in LSID (weight layout (in, out, kh, kw))
_CONV_TRANSPOSE_NAMES = {"up6", "up7", "up8", "up9"}


def _translate_path(path: Tuple[str, ...]) -> Tuple[str, str]:
    """flax param path (module..., leaf) -> (torch key, transform tag)."""
    *mods, leaf = path
    out: list[str] = []
    transform = "none"
    i = 0
    while i < len(mods):
        seg = mods[i]
        m = _STAGE_RE.match(seg)
        if m:
            out.append(f"{m.group(1)}.{m.group(2)}.{_STAGE_SLOT[m.group(3)]}")
            # Down/Upsample wrappers are Sequential(rearrange/upsample, Conv):
            # flax path continues conv/conv/...; plain convs continue conv/...
            if m.group(3) in ("down", "up"):
                rest = list(mods[i + 1 :])
                if len(rest) >= 2 and rest[0] == "conv" and rest[1] == "conv":
                    out.append("1")  # Sequential(rearrange/upsample, Conv2d)
                    i += 2  # consume the wrapper Conv; the primitive collapses
                    continue
            i += 1
            continue
        if seg == "mlp":
            # ResnetBlock/ResnetBlock2 FiLM head: Sequential(SiLU, Linear|Conv)
            out.append("mlp.1")
            i += 1
            continue
        if seg == "ff":
            out.append("ff")
            nxt = mods[i + 1]
            out.append(_NAME_RULES["proj_in" if nxt == "proj_in" else "proj_out_ff"])
            i += 2
            continue
        if seg == "to_out":
            out.append("to_out.0")  # Sequential(Linear, Dropout)
            i += 1
            continue
        if seg in ("conv", "dense", "norm") and i == len(mods) - 1 and i > 0:
            # the flax primitive inside a wrapper module is always the final
            # path segment (Conv->'conv', Dense->'dense', GroupNorm->'norm'):
            # collapse it. Earlier same-named segments are real module names
            # (e.g. the GroupNorm wrapper itself is called 'norm').
            i += 1
            continue
        if seg in _NAME_RULES:
            mapped = _NAME_RULES[seg]
            if mapped is not None:
                out.append(mapped)
            i += 1
            continue
        out.append(seg)
        i += 1

    torch_leaf = {
        "kernel": "weight",
        "bias": "bias",
        "scale": "weight",
        "embedding": "weight",
        "g": "g",
    }[leaf]
    key = ".".join(out + [torch_leaf])

    if leaf == "kernel":
        last_mod = out[-1].split(".")[-1] if out else ""
        if last_mod in _CONV_TRANSPOSE_NAMES:
            transform = "conv_transpose"
        else:
            transform = "conv_or_linear"
    return key, transform


def _apply_transform(value: np.ndarray, transform: str, flax_shape) -> np.ndarray:
    if transform == "conv_transpose":
        # torch ConvTranspose2d is the conv gradient; flax/lax conv_transpose
        # is a fractionally-strided forward conv -> spatial flip required
        # (verified numerically in tests/test_torch_import.py)
        return value.transpose(2, 3, 0, 1)[::-1, ::-1].copy()
    if transform == "conv_or_linear":
        if value.ndim == 4:
            return value.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        if value.ndim == 2:
            return value.T
    if transform == "none" and tuple(value.shape) != tuple(flax_shape):
        # RMSNorm g is (1, C, 1, 1) in torch, (C,) here
        return value.reshape(flax_shape)
    return value


def flax_to_torch_keymap(params) -> Dict[str, Tuple[Tuple[str, ...], str]]:
    """{torch_key: (flax_path, transform)} for a flax param tree."""
    out = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for keypath, value in flat:
        path = tuple(
            k.key if hasattr(k, "key") else str(k) for k in keypath
        )
        tkey, transform = _translate_path(path)
        out[tkey] = (path, transform)
    return out


def strip_module_prefix(state_dict: dict) -> dict:
    """Drop DDP 'module.' prefixes (trainer_diffusion.py:341-346)."""
    return {
        (k[7:] if k.startswith("module.") else k): v for k, v in state_dict.items()
    }


def load_torch_state_dict(path: str) -> dict:
    """Read a .pth state_dict as numpy arrays (torch CPU only)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in strip_module_prefix(sd).items()}


def import_torch_params(params, state_dict: dict, strict: bool = True):
    """Fill a flax param tree from a (numpy-valued) torch state_dict."""
    state_dict = strip_module_prefix(state_dict)
    keymap = flax_to_torch_keymap(params)

    missing = sorted(set(keymap) - set(state_dict))
    unexpected = sorted(set(state_dict) - set(keymap))
    if strict and (missing or unexpected):
        raise KeyError(
            f"torch checkpoint mismatch: missing={missing[:5]}... "
            f"unexpected={unexpected[:5]}... "
            f"({len(missing)} missing / {len(unexpected)} unexpected)"
        )

    by_path = {}
    for tkey, (fpath, transform) in keymap.items():
        if tkey in state_dict:
            by_path[fpath] = (np.asarray(state_dict[tkey]), transform)

    def fill(keypath, value):
        path = tuple(k.key if hasattr(k, "key") else str(k) for k in keypath)
        if path not in by_path:
            return value
        tv, transform = by_path[path]
        out = _apply_transform(tv, transform, value.shape)
        if tuple(out.shape) != tuple(value.shape):
            raise ValueError(
                f"shape mismatch at {'.'.join(path)}: torch {out.shape} vs "
                f"flax {value.shape}"
            )
        return out.astype(np.asarray(value).dtype)

    return jax.tree_util.tree_map_with_path(fill, params)
