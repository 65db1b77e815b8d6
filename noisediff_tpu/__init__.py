"""noisediff_tpu — a TPU-native rebuild of the NoiseDiff low-light noise-synthesis
and denoising framework (reference: IVRL/NoiseDiff, "Dark Noise Diffusion",
ICCP 2025, arXiv:2503.11262).

Layering (bottom-up):

    ops/        device-side raw-ISP math (Bayer pack/unpack, dark shading,
                camera noise tables), diffusion beta schedules, coordinate
                grids, metrics, SNA — pure jax.numpy, plus Pallas TPU kernels
                under ops/pallas.
    models/     Flax (linen) network library: NoiseDiffNet, LSID, and the
                UNet_PosEmbV2 family, built from shared blocks.
    diffusion/  the Gaussian diffusion core: training loss and jit-compiled
                lax.scan DDPM/DDIM samplers.
    data/       host-side manifests, datasets, deterministic per-process
                sharding, and the packed-array cache that replaces the
                reference's rawpy-in-DataLoader hot loop.
    parallel/   jax.sharding mesh construction and sharding rules
                (data / spatial / tensor axes).
    train/      TrainState (params/EMA/opt/step), trainers, orbax
                checkpointing, torch-checkpoint import.
    cli/        the four reference entry points with the reference's flag
                surface: train_diffusion, test_diffusion, train_denoising,
                test_denoising.

Everything on the compute path is functional and jit-friendly: static
shapes, `lax.scan` for the sampling loops, explicit PRNG keys, NHWC layout
(TPU-native), bfloat16 compute with float32 schedule buffers.
"""

__version__ = "0.1.0"
