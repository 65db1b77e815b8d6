"""NoiseDiffNet — the shipped conditional diffusion UNet.

Structural parity target: reference `models/archs/Diffusion_arch.py:447-646`.

4-stage UNet (dim_mults 1,2,4,8) with:
  * 7x7 init conv;
  * per down stage: 2x time-FiLM ResnetBlocks -> ISO cross-attention
    AttnBlock -> space-to-depth Downsample (3x3 conv at the last stage);
  * 2 mid ResnetBlocks; mirrored up path with skip concats;
  * spatial positional FiLM blocks (pos_block1/2) at entry/exit, fed by
    learned fourier features of the per-pixel [row, col] coordinate grid;
  * ISO x ratio conditioning through an Embedding(100, 16) row attended to by
    every AttnBlock (a single context token — see blocks.CrossAttention for
    the exact algebraic fast path);
  * dual-head output: out = shot_noise + read_noise, where the shot branch
    (Diffusion_arch.py:566-604) is a pixelwise MLP chain over
    concat(clean_img, x_t) and the read branch is the UNet trunk.

Reference param count at dim=48: 21,268,088 (pinned in tests/test_models.py).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import (
    AttnBlock,
    Conv,
    Downsample,
    LearnedSinusoidalPosEmb,
    Mlp,
    ResnetBlock,
    ResnetBlock2,
    TimeMlp,
    Upsample,
    _gelu,
    fold_width,
    unfold_width,
)


class NoiseDiffNet(nn.Module):
    dim: int = 48
    channels: int = 4
    dim_mults: tuple = (1, 2, 4, 8)
    resnet_block_groups: int = 8
    iso_dim: int = 16
    iso_vocab: int = 100
    pos_dim: int = 8
    attn_heads: int = 4
    attn_dim_head: int = 32
    dtype: Optional[Any] = None
    # rematerialise the ResnetBlocks in backward (jax.checkpoint): trades
    # FLOPs for HBM, enabling larger crops/batches in training (the reference
    # has no equivalent; 512-crop bs-4 training is HBM-bound on one chip)
    remat: bool = False
    # width-fold (1x2 space-to-depth) residency for the narrow (dim<96)
    # stages: C=48 tensors waste 62.5% of every 128-lane HBM transaction on
    # TPU and hit the conv emitter's per-pixel floor; folding width into
    # channels (pure reshapes + kernel transforms, numerically exact modulo
    # fp reduction order) measured ~2.2x faster stage-1 convs. None = auto
    # (enabled on the TPU backend when the spatial width allows it).
    lane_fold: Optional[bool] = None
    # return the pre-head trunk maps + raw head params instead of applying
    # the dual heads: feeds the fused heads+DDIM-update sampler kernel
    # (ops/pallas/ddim_head.py). Param tree is identical to the normal
    # path (the head banks are created at the same tree paths).
    trunk_only: bool = False

    @property
    def downsample_factor(self) -> int:
        return 2 ** (len(self.dim_mults) - 1)

    def effective_fold(self, width: int) -> int:
        """The width-fold this model applies internally for a given input
        width — samplers pass it as fold_io so the scan carry stays folded
        and the boundary reshapes cancel (diffusion.gaussian.model_predictions)."""
        lane_fold = self.lane_fold
        if lane_fold is None:
            lane_fold = jax.default_backend() == "tpu"
        return 2 if (lane_fold and width % 4 == 0 and self.dim < 96) else 1

    @nn.compact
    def __call__(self, x, time, condition):
        """x: (B, H, W, 4) noisy sample; time: (B,) int timesteps.

        condition dict (reference forward, Diffusion_arch.py:577-604):
          'clean_img'     (B, H, W, 4)
          'position'      (B, H, W, 2) coordinate grid
          'iso_ratio_idx' (B,) int32 index into the ISO x ratio embedding
        """
        assert all(d % self.downsample_factor == 0 for d in x.shape[1:3]), (
            f"input spatial dims {x.shape[1:3]} must be divisible by "
            f"{self.downsample_factor}"
        )
        clean_img = condition["clean_img"].astype(x.dtype)
        position = condition["position"].astype(x.dtype)
        iso_ratio_idx = condition["iso_ratio_idx"].astype(jnp.int32)

        dim = self.dim
        time_dim = dim * 4
        dims = [dim] + [dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        num_stages = len(in_out)

        # width-fold policy (see lane_fold): fold the stages whose channel
        # width underfills the TPU's 128-lane tiles; needs W % 4 == 0 so
        # both 48-wide stages (full and half resolution) have even width
        F = self.effective_fold(x.shape[2])
        stage_fold = [F if d < 96 else 1 for d in dims]

        # positional condition: fourier features of the coord grid -> MLP
        pos_in = fold_width(position, F) if F > 1 else position
        pos_emb = LearnedSinusoidalPosEmb(
            self.pos_dim, dtype=self.dtype, fold=F, name="pos_enc"
        )(pos_in)
        pos_emb = Mlp(
            self.pos_dim * 2, self.pos_dim, act=_gelu, dtype=self.dtype, fold=F,
            name="pos_mlp",
        )(pos_emb)

        # camera condition: one embedding token per sample, context of every attn
        iso_embed = nn.Embed(
            self.iso_vocab,
            self.iso_dim,
            embedding_init=jax.nn.initializers.normal(1.0),
            name="iso_embed",
        )
        iso_emb = iso_embed(iso_ratio_idx)[:, None, :]  # (B, 1, 16)
        iso_emb = iso_emb.astype(x.dtype)

        Res = nn.remat(ResnetBlock) if self.remat else ResnetBlock

        # timestep condition
        t = TimeMlp(dim, time_dim, dtype=self.dtype, name="time_mlp")(time)

        # shot-noise branch: pixelwise signal-dependent head (:566-604).
        # The concat(clean, x) input goes in as conv PARTS — x changes every
        # sampler step, so the concat is not loop-invariant and would
        # materialise a full-res copy per step; conv(concat(a,b)) ==
        # conv(a)+conv(b) makes it free (fold-then-slice matches the folded
        # concat layout exactly, see _ConvParams).
        if F > 1:
            shot_in = (fold_width(clean_img, F), fold_width(x, F))
        else:
            shot_in = (clean_img, x)
        shot = Mlp(dim, dim, act=_gelu, dtype=self.dtype, fold=F, name="shot_mlp1")(
            shot_in
        )
        shot_res = shot
        shot = AttnBlock(
            self.attn_heads, self.attn_dim_head, dtype=self.dtype, fold=F,
            name="shot_attn",
        )(shot, iso_emb)
        shot = Mlp(dim, dim, act=_gelu, dtype=self.dtype, fold=F, name="shot_mlp2")(
            shot
        )
        shot = Res(
            dim, time_emb_dim=time_dim, groups=2, dtype=self.dtype, fold=F,
            name="shot_time",
        )(shot, t)
        # the dual heads (shot residual add + shot_mlp3 + final_conv + sum)
        # can fuse into a single DMA-bound Pallas pass
        # (ops/pallas/dual_head.py). Measured NEUTRAL on the v5e: the
        # kernel replaces ~790us of pathological 4-8-channel conv emitters
        # with a ~210us pass, but the savings are returned in relayout
        # copies and de-fused residual adds at the custom-call boundary
        # (BENCH_NOTES.md). Kept opt-in via NOISEDIFF_FUSED_HEADS=1
        # (=interpret for tests); params are path-identical either way.
        import os

        from .blocks import _ConvParamBank, _fused_kernel_ok, _MlpBank

        head_flag = os.environ.get("NOISEDIFF_FUSED_HEADS", "")
        fuse_heads = head_flag == "interpret" or (
            head_flag == "1" and _fused_kernel_ok(shot)
        )
        # packed strided-conv heads (NOISEDIFF_PACKED_HEADS=1): keep the
        # narrow 4-channel head outputs densely tiled by packing P folded
        # pixels per output position (blocks.packed_narrow_conv — the trick
        # that fixed the LSID conv10 head). Pure XLA, exact; opt-in.
        packed_heads = (
            os.environ.get("NOISEDIFF_PACKED_HEADS", "") == "1"
            and not fuse_heads
            and not self.trunk_only
            and F > 1
            and shot.shape[2] % 2 == 0
        )
        if fuse_heads or self.trunk_only or packed_heads:
            shot_noise = None
        else:
            shot = shot + shot_res
            shot_noise = Mlp(
                dim, self.channels, act=_gelu, dtype=self.dtype, fold=F,
                name="shot_mlp3",
            )(shot)
            if F > 1:
                shot_noise = unfold_width(shot_noise, F)

        # UNet trunk (read-noise branch)
        x = fold_width(x, F) if F > 1 else x
        x = Conv(dim, 7, dtype=self.dtype, fold=F, name="init_conv")(x)
        r = x
        x = ResnetBlock2(
            dim, pos_emb_dim=self.pos_dim, groups=2, dtype=self.dtype, fold=F,
            name="pos_block1",
        )(x, pos_emb)

        skips = []
        skip_folds = []
        for ind, (dim_in, dim_out) in enumerate(in_out):
            is_last = ind >= num_stages - 1
            f_in, f_out = stage_fold[ind], stage_fold[ind + 1]
            x = Res(
                dim_in, time_emb_dim=time_dim, groups=self.resnet_block_groups,
                dtype=self.dtype, fold=f_in, name=f"downs_{ind}_block1",
            )(x, t)
            skips.append(x)
            skip_folds.append(f_in)
            x = Res(
                dim_in, time_emb_dim=time_dim, groups=self.resnet_block_groups,
                dtype=self.dtype, fold=f_in, name=f"downs_{ind}_block2",
            )(x, t)
            skips.append(x)
            skip_folds.append(f_in)
            x = AttnBlock(
                self.attn_heads, self.attn_dim_head, dtype=self.dtype, fold=f_in,
                name=f"downs_{ind}_attn",
            )(x, iso_emb)
            if not is_last:
                x = Downsample(
                    dim_out, dtype=self.dtype, fold_in=f_in, fold_out=f_out,
                    name=f"downs_{ind}_down",
                )(x)
            else:
                x = Conv(dim_out, 3, dtype=self.dtype, fold=f_in,
                         name=f"downs_{ind}_down")(x)
                if f_in > 1 and f_out == 1:
                    x = unfold_width(x, f_in)

        mid_dim = dims[-1]
        # the deepest stage may still be folded when every dim is < 96
        # (small test models); production dim=48 reaches here unfolded
        mid_fold = stage_fold[-1]
        x = Res(
            mid_dim, time_emb_dim=time_dim, groups=self.resnet_block_groups,
            dtype=self.dtype, fold=mid_fold, name="mid_block1",
        )(x, t)
        x = Res(
            mid_dim, time_emb_dim=time_dim, groups=self.resnet_block_groups,
            dtype=self.dtype, fold=mid_fold, name="mid_block2",
        )(x, t)

        for ind, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = ind == num_stages - 1
            stage = num_stages - 1 - ind  # the down stage this mirrors
            f_out = stage_fold[stage + 1]  # fold of the tensors at dim_out
            f_in = stage_fold[stage]  # fold of this stage's output (dim_in)
            # skip joins as TUPLES: conv(concat(a,b)) == conv(a)+conv(b), so
            # the concat copy (and, folded, the multi-segment kernel
            # scatter XLA mis-optimises) never materialises
            skip = skips.pop()
            sf = skip_folds.pop()
            if f_out == 1 and sf > 1:
                skip = unfold_width(skip, sf)
            x = Res(
                dim_out, time_emb_dim=time_dim, groups=self.resnet_block_groups,
                dtype=self.dtype, fold=f_out, name=f"ups_{ind}_block1",
            )((x, skip), t)
            skip = skips.pop()
            sf = skip_folds.pop()
            if f_out == 1 and sf > 1:
                skip = unfold_width(skip, sf)
            x = Res(
                dim_out, time_emb_dim=time_dim, groups=self.resnet_block_groups,
                dtype=self.dtype, fold=f_out, name=f"ups_{ind}_block2",
            )((x, skip), t)
            x = AttnBlock(
                self.attn_heads, self.attn_dim_head, dtype=self.dtype, fold=f_out,
                name=f"ups_{ind}_attn",
            )(x, iso_emb)
            if not is_last:
                if f_out > 1 and f_in > 1:
                    # stays in folded land across the upsample: unfold,
                    # nearest-x2, refold inside Upsample
                    x = unfold_width(x, f_out)
                    x = Upsample(dim_in, dtype=self.dtype, fold_out=f_in,
                                 name=f"ups_{ind}_up")(x)
                elif f_in > 1:
                    x = Upsample(dim_in, dtype=self.dtype, fold_out=f_in,
                                 name=f"ups_{ind}_up")(x)
                else:
                    x = Upsample(dim_in, dtype=self.dtype, name=f"ups_{ind}_up")(x)
            else:
                x = Conv(dim_in, 3, dtype=self.dtype, fold=f_out,
                         name=f"ups_{ind}_up")(x)

        x = ResnetBlock2(
            dim, pos_emb_dim=self.pos_dim, groups=2, dtype=self.dtype, fold=F,
            name="pos_block2",
        )(x, pos_emb)

        x = Res(
            dim, time_emb_dim=time_dim, groups=self.resnet_block_groups,
            dtype=self.dtype, fold=F, name="final_res_block",
        )((x, r), t)
        if self.trunk_only:
            # pre-head maps stay FOLDED (F); the fused sampler kernel works
            # in the folded domain and the carry is folded too (fold_io)
            w1, b1, w2, b2 = _MlpBank(dim, dim, self.channels,
                                      name="shot_mlp3")()
            wr, br = _ConvParamBank((1, 1), dim, self.channels,
                                    name="final_conv")()
            return x, shot, shot_res, (w1[0, 0], b1, w2[0, 0], b2, wr[0, 0],
                                       br)
        if packed_heads:
            from .blocks import _fold_conv_kernel, packed_narrow_conv

            w1, b1, w2, b2 = _MlpBank(dim, dim, self.channels,
                                      name="shot_mlp3")()
            wr, br = _ConvParamBank((1, 1), dim, self.channels,
                                    name="final_conv")()
            s = shot + shot_res
            dt = s.dtype
            h = jax.lax.conv_general_dilated(
                s, _fold_conv_kernel(w1, (dim,), F).astype(dt), (1, 1),
                "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + jnp.tile(b1, F).astype(dt)
            h = _gelu(h)
            out = packed_narrow_conv(h, w2[0, 0], b2, F) + packed_narrow_conv(
                x, wr[0, 0], br, F
            )
            return unfold_width(out, F).astype(self.dtype)
        if fuse_heads:
            from ..ops.pallas.dual_head import fused_dual_head

            w1, b1, w2, b2 = _MlpBank(dim, dim, self.channels,
                                      name="shot_mlp3")()
            wr, br = _ConvParamBank((1, 1), dim, self.channels,
                                    name="final_conv")()
            out = fused_dual_head(
                x, shot, shot_res, w1[0, 0], b1, w2[0, 0], b2, wr[0, 0], br,
                F, head_flag == "interpret",
            )
            if F > 1:
                out = unfold_width(out, F)
            # Keep the output dtype contract identical to the XLA path
            # (shot_noise + read_noise in self.dtype) so the env flag never
            # changes downstream accumulation precision; the sampler converts
            # to f32 at the scan edge either way.
            return out.astype(self.dtype)
        read_noise = Conv(self.channels, 1, dtype=self.dtype, fold=F,
                          name="final_conv")(x)
        if F > 1:
            read_noise = unfold_width(read_noise, F)
        return shot_noise + read_noise
