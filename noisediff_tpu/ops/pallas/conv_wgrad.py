"""Streaming conv weight-gradient Pallas kernel (stride-1 SAME, NHWC).

The crop-512 train graph's remaining hot spot (BENCH_NOTES round-2/3
profiles): XLA lowers the wgrad of the width-folded full-res 3x3 convs
(final_res_block / pos_block2 and the up-stage blocks) into re-tiled
halo-padded convolution fusions plus activation-sized masked-select
rewrites of the fold-selector einsum — ~1 ms per conv plus forced layout
copies, <25% of it MXU work. The round-2 note calling a Mosaic wgrad
kernel "blocked by the ~164 GB/s Mosaic DMA ceiling" is stale: that
number was a dispatch artifact; clean Pallas streaming sustains
537-546 GB/s on this runtime and the round-3 GN-stats kernels won at
exactly this bandwidth class (BENCH_NOTES "Mosaic DMA note").

This kernel computes the FOLDED-domain kernel gradient directly:

    dkf[ih, iw, ci, co] = sum_{b,h,w} x[b, h+ih-pl_h, w+iw-pl_w, ci]
                                    * g[b, h, w, co]

(zero outside bounds; pl = (k-1)//2 per dim — XLA's SAME convention,
which for the even folded kernel width kwf=2 means pad (0, 1)). Each
grid step streams one row-block of x and g at Mosaic DMA rates — the
(H, W, B, C) transpose is the same layout bitcast the gn_stats kernels
use, so the custom call's operand layout is PHYSICALLY the conv
emitters' batch-in-sublanes layout — and accumulates all kh*kwf tap
contractions as (N, Ci)^T @ (N, Co) MXU dots into an fp32 VMEM
accumulator. Row taps crossing the block boundary are handled by a
1-row VMEM carry of the previous block's last x and g rows (the TPU
grid is sequential), so every tensor is read from HBM exactly once.

Supports kh in {1, 3} (row-carry depth 1) and any kwf in {1, 2, 3}.
The caller maps dkf back to the reference (unfolded) kernel gradient by
transposing the fold-selector einsum (models/blocks._fold_conv_kernel),
a (kh, kwf, Cf, Cf)-sized operation XLA handles trivially.

Reference counterpart: the backward of every nn.Conv2d in the reference
UNets (e.g. /root/reference/models/Diffusion_arch.py:128-170), which
cuDNN serves on GPU; on TPU this kernel replaces XLA's wgrad-as-conv
lowering for the folded train graph.
"""
import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

from .gn_stats import _axes_of, _spec4, _tile_rows, TILE_ELEM_LIMIT


def _shift_w(t, dw):
    """t[:, w + dw] with zero fill (w is axis 1 of an (R, W, B, C) block)."""
    if dw == 0:
        return t
    z = jnp.zeros_like(t[:, :1])
    if dw > 0:
        return jnp.concatenate([t[:, dw:], z], axis=1)
    return jnp.concatenate([z, t[:, :dw]], axis=1)


def _kernel(x_ref, g_ref, out_ref, xprev_ref, gprev_ref, *, kh, kwf):
    i = pl.program_id(0)
    r, w, b, ci = x_ref.shape
    co = g_ref.shape[-1]
    pl_h, pl_w = (kh - 1) // 2, (kwf - 1) // 2

    @pl.when(i == 0)
    def _zero_carry():
        xprev_ref[...] = jnp.zeros_like(xprev_ref)
        gprev_ref[...] = jnp.zeros_like(gprev_ref)

    x = x_ref[...]
    g = g_ref[...]
    # row-tap variants. di = ih - pl_h:
    #   di = -1: sum_h x[h-1] (x) g[h]      -> pair (x shifted down, g)
    #   di =  0: sum_h x[h]   (x) g[h]      -> (x, g)
    #   di = +1: sum_h x[h+1] (x) g[h], re-indexed r = h+1
    #            = sum_r x[r] (x) g[r-1]    -> (x, g shifted down)
    # "shifted down" = [prev block's last row; this block minus its last],
    # exact across block boundaries via the sequential-grid carry.
    if kh == 3:
        # concat-then-slice (not concat([prev, t[:-1]])): at the crop-512
        # full-res shape the VMEM budget yields r=1 row tiles, where
        # t[:-1] is a zero-size slice Mosaic cannot type.
        x_m1 = jnp.concatenate([xprev_ref[...], x], axis=0)[:r]
        g_m1 = jnp.concatenate([gprev_ref[...], g], axis=0)[:r]
        pairs = [(x_m1, g), (x, g), (x, g_m1)]  # di = -1, 0, +1
    else:
        pairs = [(x, g)]

    def dot2(a, bb):
        a2 = a.reshape(r * w * b, ci)
        b2 = bb.reshape(r * w * b, co)
        return jax.lax.dot_general(
            a2, b2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    taps = []
    for xa, ga in pairs:
        for iw in range(kwf):
            taps.append(dot2(_shift_w(xa, iw - pl_w), ga))
    vals = jnp.stack(taps, axis=0)  # (kh*kwf, ci, co) fp32

    @pl.when(i == 0)
    def _init():
        out_ref[...] = vals

    @pl.when(i != 0)
    def _acc():
        out_ref[...] += vals

    xprev_ref[...] = x[-1:]
    gprev_ref[...] = g[-1:]


def conv_wgrad(g, x, kh: int, kwf: int, interpret: bool = False):
    """Folded-domain wgrad of a stride-1 SAME conv.

    g: (B, H, W, Co) cotangent; x: (B, H, W, Ci) activation (both already
    in the folded layout). Returns fp32 (kh, kwf, Ci, Co)."""
    assert kh in (1, 3), kh
    assert kwf in (1, 2, 3), kwf
    b, h, w, ci = x.shape
    co = g.shape[-1]
    # two streamed tensors + shifted temporaries: quarter the stats budget.
    # Budget against the PADDED VMEM residency, not logical elements: the
    # (8, 128) tile pads B up to 8 sublanes and C up to 128 lanes, so a
    # narrow-channel block occupies up to 32x its logical size (measured:
    # a C=4 operand blew the 16M scoped-vmem limit with a logical ~128K
    # block). Callers should also prefer XLA for narrow convs — see
    # blocks._wgrad_channels_ok.
    pad_b = -(-b // 8) * 8
    pad_c = -(-max(ci, co) // 128) * 128
    # NOISEDIFF_WGRAD_TILE_BOOST multiplies the row-tile budget (A/B knob:
    # at the crop-512 hot shape the default budget yields r=1 → a
    # 512-step grid; boost 2 gives r=2 at ~9 MB VMEM residency)
    boost = int(os.environ.get("NOISEDIFF_WGRAD_TILE_BOOST", "1"))
    r = _tile_rows(h, w * pad_b, pad_c, (TILE_ELEM_LIMIT * boost) // 4)
    xt = jnp.transpose(x, (1, 2, 0, 3))  # layout bitcasts (see module doc)
    gt = jnp.transpose(g, (1, 2, 0, 3))
    out = pl.pallas_call(
        functools.partial(_kernel, kh=kh, kwf=kwf),
        grid=(h // r,),
        in_specs=[
            pl.BlockSpec((r, w, b, ci), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, w, b, co), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kh * kwf, ci, co), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kh * kwf, ci, co), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, w, b, ci), x.dtype),
            pltpu.VMEM((1, w, b, co), g.dtype),
        ],
        interpret=interpret,
    )(xt, gt)
    return out.reshape(kh, kwf, ci, co)


@functools.partial(custom_partitioning, static_argnums=(2, 3, 4))
def conv_wgrad_p(g, x, kh: int, kwf: int, interpret: bool = False):
    """conv_wgrad with an SPMD partition rule so the kernel survives pjit
    on >1-device meshes (otherwise the partitioner replicates both full
    activations onto every chip). Dataflow: b, h, AND w are all reduction
    factors of the wgrad — each shard streams its local tile and a psum
    over whichever mesh axes shard them produces the (replicated) kernel
    gradient; under pure data parallelism that psum IS the DDP gradient
    all-reduce, just taken early.

    Boundary note: sharding h slices the halo taps at shard edges — rows
    that pair across a shard boundary contribute zeros instead of the
    neighbour's row. The train mesh shards only b (data axis), where the
    kernel is exact; h/w-sharded TRAINING isn't a supported configuration
    (spatial sharding is a generation-time feature, and generation never
    differentiates), enforced below."""
    return conv_wgrad(g, x, kh, kwf, interpret)


def _wg_pick(arg_shapes):
    shardings = [a.sharding for a in arg_shapes]
    return max(
        shardings, key=lambda sh: sum(bool(_axes_of(d)) for d in _spec4(sh))
    )


def _wg_infer(kh, kwf, interpret, mesh, arg_shapes, result_shape):
    return NamedSharding(mesh, P(None, None, None, None))


def _wg_partition(kh, kwf, interpret, mesh, arg_shapes, result_shape):
    arg_sh = _wg_pick(arg_shapes)
    spec = _spec4(arg_sh)
    if _axes_of(spec[1]) or _axes_of(spec[2]):
        raise ValueError(
            "conv_wgrad_p: spatially-sharded activations are not supported "
            "in the training graph (halo taps would drop cross-shard "
            "pairs); shard the batch axis only, or set NOISEDIFF_WGRAD=xla"
        )
    reduce_axes = _axes_of(spec[0])
    out = NamedSharding(mesh, P(None, None, None, None))

    def lower(g, x):
        dk = conv_wgrad(g, x, kh, kwf, interpret)
        if reduce_axes:
            dk = jax.lax.psum(dk, reduce_axes)
        return dk

    return mesh, lower, out, (arg_sh, arg_sh)


conv_wgrad_p.def_partition(
    _wg_partition,
    infer_sharding_from_operands=_wg_infer,
    sharding_rule="b h w c, b h w d -> i j c d",
    reduction_factors=("b", "h", "w"),
)


def conv_wgrad_dispatch(g, x, kh: int, kwf: int, interpret: bool = False):
    # same global-device-count gate + pjit-only assumption as
    # gn_stats._dispatch
    if jax.device_count() > 1:
        return conv_wgrad_p(g, x, kh, kwf, interpret)
    return conv_wgrad(g, x, kh, kwf, interpret)
