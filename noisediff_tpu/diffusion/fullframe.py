"""Full-frame noise generation, spatially sharded over the device mesh.

The reference can only generate fixed square crops and tiles them with an
overlapping grid (dataset.py:203-219). On TPU the whole packed SID frame
(1424 x 2128 x 4) fits one generation pass when the image height is sharded
over the mesh's 'spatial' axis: XLA partitions every conv with automatic
halo exchange over ICI, and the cross-attention context (one ISO token) is
replicated — this workload is embarrassingly spatially shardable
(SURVEY.md §5 long-context note).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.coords import make_coord
from ..parallel.mesh import (
    SPATIAL_AXIS,
    activate,
    data_sharding,
    make_mesh,
    replicated,
)
from .gaussian import GaussianDiffusion


def generate_full_frame(
    gd: GaussianDiffusion,
    params,
    rng,
    clean_img: np.ndarray,
    iso_ratio_idx: int,
    mesh=None,
    sampler: str = "dpm",
    sampling_timesteps: Optional[int] = None,
    dpm_spacing: str = "lambda",
):
    """Generate a full-frame noise map conditioned on a packed clean frame.

    clean_img: (H, W, 4) host array; H must be divisible by the UNet's
    downsample factor (8). Returns (H, W, 4) numpy noise.
    """
    h, w, c = clean_img.shape
    mesh = mesh or make_mesh(
        {SPATIAL_AXIS: jax.local_device_count()}, devices=jax.devices()
    )

    coord = make_coord(h, w, rescale=True)
    batch_sharding = data_sharding(mesh, 4, spatial=True)
    condition = {
        "clean_img": jax.device_put(
            jnp.asarray(clean_img, jnp.float32)[None], batch_sharding
        ),
        "position": jax.device_put(jnp.asarray(coord, jnp.float32)[None], batch_sharding),
        "iso_ratio_idx": jax.device_put(
            jnp.asarray([iso_ratio_idx], jnp.int32), replicated(mesh)
        ),
    }
    params = jax.device_put(params, replicated(mesh))
    shape = (1, h, w, c)

    def fn(params, rng, condition):
        if sampler == "dpm":
            return gd.dpm_solver_sample(
                params, rng, shape, condition,
                sampling_timesteps=sampling_timesteps,
                step_spacing=dpm_spacing,
            )
        if sampler == "ddim":
            return gd.ddim_sample(
                params, rng, shape, condition, sampling_timesteps=sampling_timesteps
            )
        return gd.p_sample_loop(params, rng, shape, condition)

    with activate(mesh):  # trace-time mesh visibility (GN SPMD rules)
        out = jax.jit(fn, out_shardings=batch_sharding)(params, rng, condition)
    return np.asarray(out[0])
