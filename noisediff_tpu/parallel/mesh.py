"""Device-mesh construction and sharding rules.

The reference's entire distributed story is NCCL DDP gradient all-reduce
(SURVEY.md §2.7: `init_dist` train_diffusion.py:18-25, DDP modules.py:79,
DistIterSampler data_sampler.py:12-62). The TPU-native replacement is a
`jax.sharding.Mesh` with named axes and jit-compiled collectives over ICI:

  data     batch-parallel training / bulk generation (the only axis the
           reference's workload needs; gradients all-reduce implicitly
           through jit's partitioner).
  spatial  sequence-parallel analogue for this domain: shards the image H
           dimension; XLA inserts halo exchanges for the convolutions. Used
           for full-frame (2128x1424) generation that exceeds one chip's HBM.
  model    tensor-parallel axis: shards wide conv/dense output channels; XLA
           inserts the all-gathers / reduce-scatters.

No NCCL analogue is written by hand — XLA owns the collectives.
"""
from __future__ import annotations

import contextlib
import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"
MODEL_AXIS = "model"


@contextlib.contextmanager
def activate(mesh: Optional[Mesh]):
    """`with activate(mesh):` — jax.set_mesh for >1-device meshes, no-op
    otherwise.

    Wrapping a traced call in this makes the mesh visible at trace time
    (jax.sharding.get_abstract_mesh), which is what routes the Pallas
    GN-stats kernels through their custom_partitioning wrappers
    (ops/pallas/gn_stats._mesh_devices) — a mesh that arrives only via
    in_shardings is invisible inside the trace. Single-device meshes
    skip set_mesh entirely so single-chip traces are byte-identical to
    before this gate existed. Implemented as a generator so the global
    mesh is only set at __enter__, never at call time — a discarded
    activate(mesh) value must not leak mesh state into later traces."""
    if mesh is None or mesh.size <= 1:
        yield
        return
    with jax.set_mesh(mesh):
        yield


def make_mesh(
    axis_sizes: Optional[dict] = None, devices: Optional[Sequence] = None
) -> Mesh:
    """Build a mesh. Default: 1-D ('data',) over all local devices.

    axis_sizes: ordered {axis_name: size}; sizes must multiply to the device
    count (a -1 size is inferred).
    """
    devices = list(devices if devices is not None else jax.devices())
    if not axis_sizes:
        axis_sizes = {DATA_AXIS: len(devices)}
    names = tuple(axis_sizes.keys())
    sizes = list(axis_sizes.values())
    known = int(np.prod([s for s in sizes if s != -1]))
    sizes = [len(devices) // known if s == -1 else s for s in sizes]
    if int(np.prod(sizes)) != len(devices):
        raise ValueError(f"mesh {dict(zip(names, sizes))} != {len(devices)} devices")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, names)


def data_sharding(mesh: Mesh, ndim: int, spatial: bool = False) -> NamedSharding:
    """Sharding for an (B, H, W, C) batch: B over 'data', optionally H over 'spatial'."""
    spec = [None] * ndim
    if DATA_AXIS in mesh.axis_names:
        spec[0] = DATA_AXIS
    if spatial and SPATIAL_AXIS in mesh.axis_names and ndim >= 3:
        spec[1] = SPATIAL_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_replicated(mesh: Mesh, tree):
    """Place a pytree fully-replicated onto the mesh WITHOUT collectives.

    `jax.device_put(host_value, multi_process_sharding)` runs
    multihost_utils.assert_equal — one gloo allgather per leaf — to check
    the processes agree on the value. For a 400-leaf param tree that is
    hundreds of sequential 30s-timeout-prone collectives, and any compile
    desync between ranks deadlocks the job (observed: two-process train on
    a 1-core box). Parameters here are deterministic from a shared seed, so
    the check buys nothing: build each global array directly from the
    process-local copy instead (zero communication).
    """
    sh = replicated(mesh)
    multihost = jax.process_count() > 1

    def put(x):
        if multihost:
            return jax.make_array_from_process_local_data(sh, np.asarray(x))
        return jax.device_put(x, sh)

    return jax.tree.map(put, tree)


def shard_batch(mesh: Mesh, batch, spatial: bool = False):
    """Place a pytree of host arrays with batch-dim sharding.

    Single process: device_put. Multi-host (jax.process_count() > 1): the
    input is each process's LOCAL shard (the per-rank batch produced by
    ShardedIterSampler — the reference's DistIterSampler semantics) and is
    assembled into a global array without any cross-host transfer."""
    multihost = jax.process_count() > 1

    def put(x):
        x = np.asarray(x)
        sh = (
            replicated(mesh)
            if x.ndim == 0
            else data_sharding(mesh, x.ndim, spatial=spatial)
        )
        if multihost:
            return jax.make_array_from_process_local_data(sh, x)
        return jax.device_put(x, sh)

    return jax.tree.map(put, batch)


# --- tensor-parallel parameter rules ---------------------------------------

# Conv kernels are HWIO, Dense kernels are (in, out): shard the output-channel
# (last) dim of wide layers over 'model'. Narrow layers (<min_width) stay
# replicated — the all-gather would cost more than the FLOPs saved.
_TP_MIN_WIDTH = 128


def param_sharding_rules(mesh: Mesh, params, min_width: int = _TP_MIN_WIDTH):
    """Pytree of NamedSharding for params: TP over 'model' if present, else replicated."""
    use_tp = MODEL_AXIS in mesh.axis_names and mesh.shape[MODEL_AXIS] > 1
    tp_size = mesh.shape[MODEL_AXIS] if use_tp else 1

    def rule(path, x):
        if not use_tp or x.ndim < 2:
            return replicated(mesh)
        out_dim = x.shape[-1]
        if out_dim >= min_width and out_dim % tp_size == 0:
            return NamedSharding(mesh, P(*([None] * (x.ndim - 1) + [MODEL_AXIS])))
        return replicated(mesh)

    return jax.tree_util.tree_map_with_path(rule, params)
