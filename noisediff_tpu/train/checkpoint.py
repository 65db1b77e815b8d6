"""Checkpoint save/restore via orbax, plus component-file semantics.

Parity target: reference save/load (trainer_diffusion.py:333-364): one file
per component per epoch ('{net|ema|optimizer_G|scheduler}_{epoch}.pth'),
EMA snapshots save the averaged model itself, loads tolerate the DDP
'module.' prefix. Here:

  * components map to orbax directories '{name}_{epoch}' under snapshot_dir;
  * 'net' = params, 'ema' = EMA params (the averaged weights, like the
    reference's ema_model), 'optimizer_G' = opt_state + step;
  * torch '.pth' checkpoints are imported through train/torch_import.py when
    a load path ends with .pth (so reference-pretrained weights validate the
    rebuild).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    HAS_ORBAX = True
except Exception:  # pragma: no cover
    ocp = None
    HAS_ORBAX = False


def _to_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def _save_npz(path: str, tree: Any) -> None:
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    paths = {jax.tree_util.keystr(k): v for k, v in flat}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path + ".npz", **paths)


def save_component(snapshot_dir: str, name: str, epoch, tree: Any) -> str:
    """Save one component ('net', 'ema', 'optimizer_G', ...) for `epoch`.

    In multi-process runs the write goes through the process-local npz path,
    NOT orbax: the trainers keep the reference's rank-0-only snapshot gating
    (trainer_diffusion.py:214-218), and orbax's StandardCheckpointer runs
    multihost barriers (multihost_utils.assert_equal) inside save — calling
    it from one rank deadlocks the others. The tree is gathered to host
    first (fully-replicated arrays convert locally, no collective), so a
    single-rank npz write is safe."""
    path = os.path.abspath(os.path.join(snapshot_dir, f"{name}_{epoch}"))
    tree = _to_numpy_tree(tree)
    if HAS_ORBAX and jax.process_count() == 1:
        ckpt = ocp.StandardCheckpointer()
        ckpt.save(path, tree, force=True)
        ckpt.wait_until_finished()
    else:  # flat-npz fallback (also the multi-process rank-0 path, see above)
        _save_npz(path, tree)
    return path


def load_component(path: str, like: Optional[Any] = None) -> Any:
    """Restore a component saved by save_component, or import a torch .pth."""
    if path.endswith(".pth") or path.endswith(".pt"):
        from .torch_import import load_torch_state_dict

        return load_torch_state_dict(path)
    if os.path.exists(path + ".npz"):
        # npz snapshots are written by multi-process runs even when orbax is
        # installed (see save_component) — honour them first
        return _load_npz(path, like)
    if HAS_ORBAX:
        ckpt = ocp.StandardCheckpointer()
        if like is not None:
            target = jax.tree.map(
                lambda x: ocp.utils.to_shape_dtype_struct(x)
                if hasattr(ocp.utils, "to_shape_dtype_struct")
                else jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
                _to_numpy_tree(like),
            )
            return ckpt.restore(os.path.abspath(path), target)
        return ckpt.restore(os.path.abspath(path))
    return _load_npz(path, like)


def _load_npz(path: str, like: Optional[Any] = None) -> Any:
    """Restore an npz component. With `like`, rebuild the pytree by matching
    each leaf's keystr path; without, return the flat {keystr: array} dict."""
    with np.load(path + ".npz", allow_pickle=True) as data:
        flat = {k: data[k] for k in data.files}
    if like is None:
        return flat
    leaves_like, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for k, v in leaves_like:
        key = jax.tree_util.keystr(k)
        if key not in flat:
            raise KeyError(f"snapshot {path}.npz is missing leaf {key}")
        arr = flat[key]
        leaves.append(arr.astype(v.dtype) if hasattr(v, "dtype") else arr)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def component_exists(path: str) -> bool:
    """True if save_component wrote this path (orbax dir or npz fallback)."""
    return os.path.isdir(path) or os.path.exists(path + ".npz")


def _saved_opt_layout_is_current(path: str) -> bool:
    """Probe whether an 'optimizer_G' snapshot uses the current
    {'opt_state', 'step'} layout (vs the legacy bare opt_state tree),
    without a full restore — so genuine corruption in either layout
    surfaces as its real error instead of a misleading legacy retry."""
    if os.path.isdir(path):  # orbax
        meta = ocp.StandardCheckpointer().metadata(os.path.abspath(path))
        # orbax wraps the saved tree structure: StepMetadata.item_metadata
        # is a TreeMetadata whose .tree is the top-level pytree.
        tree = getattr(meta, "item_metadata", meta)
        tree = getattr(tree, "tree", tree)
        try:
            keys = set(tree.keys())
        except AttributeError:
            return False
        return keys == {"opt_state", "step"}
    # npz fallback: keys are jax keystr paths like "['opt_state']..."
    with np.load(path + ".npz", allow_pickle=True) as data:
        keys = list(data.keys())
    return all(k.startswith("['opt_state']") or k == "['step']" for k in keys) and any(
        k == "['step']" for k in keys
    )


def load_opt_component(path: str, opt_state_like, step_like):
    """Restore an 'optimizer_G' snapshot in either layout.

    Current payload: {'opt_state': ..., 'step': ...}. Legacy (round-1)
    snapshots saved the bare opt_state tree — a strict restore against the
    new target raises on the structure mismatch, which would turn
    '--resume auto' against a pre-existing run dir into a crash (the exact
    flow it exists to serve). The layout is detected by probing the saved
    tree structure, not by catching restore errors, so corruption is not
    masked. Returns (opt_state, step-or-None)."""
    if _saved_opt_layout_is_current(path):
        restored = load_component(
            path, like={"opt_state": opt_state_like, "step": step_like}
        )
        return restored["opt_state"], restored["step"]
    return load_component(path, like=opt_state_like), None


def latest_epoch(snapshot_dir: str, name: str = "net") -> Optional[str]:
    """Newest '{name}_{epoch}' snapshot tag ('final' outranks any number)."""
    if not os.path.isdir(snapshot_dir):
        return None
    tags = [
        entry[len(name) + 1 :].removesuffix(".npz")
        for entry in os.listdir(snapshot_dir)
        if entry.startswith(name + "_")
    ]
    if not tags:
        return None
    return max(tags, key=lambda t: (t == "final", _as_int(t)))


def _as_int(tag: str) -> int:
    try:
        return int(tag)
    except ValueError:
        return -1
