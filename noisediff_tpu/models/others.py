"""The UNet_PosEmbV2 family of alternate diffusion UNets.

Structural parity targets (reference `models/archs/others_arch.py`):
  UNet_PosEmbV2            :364-535  clean-image encoder branch + spatial pos
                                     FiLM; no ISO attention
  UNet_PosEmbV2_NoPosition :540-706  pos blocks become plain ResnetBlocks
  UNet_PosEmbV2_CameraCond :796-985  = PosEmbV2 + ISO cross-attention per stage

All three share one parameterised trunk here. Reference param counts at
dim=48 (pinned in tests): 19,702,596 / 19,700,308 / 21,262,164.
"""
from __future__ import annotations

import os
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


class PosEmbUNet(nn.Module):
    """Shared trunk for the UNet_PosEmbV2 variants."""

    dim: int = 48
    channels: int = 4
    cond_dim: int = 4
    dim_mults: tuple = (1, 2, 4, 8)
    resnet_block_groups: int = 8
    pos_dim: int = 8
    iso_dim: int = 16
    iso_vocab: int = 100
    use_position: bool = True
    use_iso_attn: bool = False
    dtype: Optional[Any] = None
    # width-fold the narrow (dim < 96) stages; see NoiseDiffNet.lane_fold
    lane_fold: Optional[bool] = None

    @property
    def downsample_factor(self) -> int:
        return 2 ** (len(self.dim_mults) - 1)

    @nn.compact
    def __call__(self, x, time, condition):
        assert all(d % self.downsample_factor == 0 for d in x.shape[1:3])

        if isinstance(condition, dict):
            clean_img = condition["clean_img"]
            position = condition.get("position")
            iso_ratio_idx = condition.get("iso_ratio_idx")
        else:
            # UNet_PosEmbV2_NoPosition takes the bare clean image as condition
            # (others_arch.py:661)
            clean_img, position, iso_ratio_idx = condition, None, None
        clean_img = clean_img.astype(x.dtype)

        dim = self.dim
        time_dim = dim * 4
        dims = [dim] + [dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        num_stages = len(in_out)

        lane_fold = self.lane_fold
        if lane_fold is None:
            lane_fold = jax.default_backend() == "tpu"
        lane_fold = lane_fold and x.shape[2] % 4 == 0 and dim < 96
        F = 2 if lane_fold else 1
        stage_fold = [F if d < 96 else 1 for d in dims]

        pos_emb = None
        if self.use_position:
            pos_in = position.astype(x.dtype)
            if F > 1:
                pos_in = fold_width(pos_in, F)
            pos_emb = LearnedSinusoidalPosEmb(
                self.pos_dim, dtype=self.dtype, fold=F, name="pos_enc"
            )(pos_in)
            pos_emb = Mlp(
                self.pos_dim * 2, self.pos_dim, act=_gelu, dtype=self.dtype,
                fold=F, name="pos_mlp",
            )(pos_emb)

        iso_emb = None
        if self.use_iso_attn:
            iso_emb = nn.Embed(
                self.iso_vocab, self.iso_dim,
                embedding_init=jax.nn.initializers.normal(1.0), name="iso_embed",
            )(iso_ratio_idx.astype(jnp.int32))[:, None, :].astype(x.dtype)

        # clean image encoder branch (others_arch.py:476-479, 493-500)
        clean_f = fold_width(clean_img, F) if F > 1 else clean_img
        clean_emb = Conv(dim, 7, dtype=self.dtype, fold=F, name="cond_init_conv")(
            clean_f
        )
        clean_emb = ResnetBlock(
            dim, groups=self.resnet_block_groups, dtype=self.dtype, fold=F,
            name="cond_res_block1",
        )(clean_emb)

        t = TimeMlp(dim, time_dim, dtype=self.dtype, name="time_mlp")(time)

        x = fold_width(x, F) if F > 1 else x
        x = Conv(dim, 7, dtype=self.dtype, fold=F, name="init_conv")(x)
        r = x
        x = Conv(dim, 3, dtype=self.dtype, fold=F, name="cond_concat_conv")(
            (x, clean_emb)
        )

        if self.use_position:
            x = ResnetBlock2(
                dim, pos_emb_dim=self.pos_dim, groups=2, dtype=self.dtype,
                fold=F, name="pos_block1",
            )(x, pos_emb)
        else:
            # NoPosition variant: plain ResnetBlock, groups=2 (others_arch.py:644-646)
            x = ResnetBlock(dim, groups=2, dtype=self.dtype, fold=F,
                            name="pos_block1")(x)

        skips = []
        skip_folds = []
        for ind, (dim_in, dim_out) in enumerate(in_out):
            is_last = ind >= num_stages - 1
            f_in, f_out = stage_fold[ind], stage_fold[ind + 1]
            x = ResnetBlock(
                dim_in, time_emb_dim=time_dim, groups=self.resnet_block_groups,
                dtype=self.dtype, fold=f_in, name=f"downs_{ind}_block1",
            )(x, t)
            skips.append(x)
            skip_folds.append(f_in)
            x = ResnetBlock(
                dim_in, time_emb_dim=time_dim, groups=self.resnet_block_groups,
                dtype=self.dtype, fold=f_in, name=f"downs_{ind}_block2",
            )(x, t)
            skips.append(x)
            skip_folds.append(f_in)
            if self.use_iso_attn:
                x = AttnBlock(4, 32, dtype=self.dtype, fold=f_in,
                              name=f"downs_{ind}_attn")(x, iso_emb)
            if not is_last:
                x = Downsample(dim_out, dtype=self.dtype, fold_in=f_in,
                               fold_out=f_out, name=f"downs_{ind}_down")(x)
            else:
                x = Conv(dim_out, 3, dtype=self.dtype, fold=f_in,
                         name=f"downs_{ind}_down")(x)
                if f_in > 1 and f_out == 1:
                    x = unfold_width(x, f_in)

        mid_dim = dims[-1]
        # the deepest stage may still be folded when every dim is < 96
        # (small test models); see NoiseDiffNet mid blocks
        mid_fold = stage_fold[-1]
        x = ResnetBlock(
            mid_dim, time_emb_dim=time_dim, groups=self.resnet_block_groups,
            dtype=self.dtype, fold=mid_fold, name="mid_block1",
        )(x, t)
        x = ResnetBlock(
            mid_dim, time_emb_dim=time_dim, groups=self.resnet_block_groups,
            dtype=self.dtype, fold=mid_fold, name="mid_block2",
        )(x, t)

        for ind, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = ind == num_stages - 1
            stage = num_stages - 1 - ind
            f_out = stage_fold[stage + 1]
            f_in = stage_fold[stage]
            skip = skips.pop()
            sf = skip_folds.pop()
            if f_out == 1 and sf > 1:
                skip = unfold_width(skip, sf)
            x = ResnetBlock(
                dim_out, time_emb_dim=time_dim, groups=self.resnet_block_groups,
                dtype=self.dtype, fold=f_out, name=f"ups_{ind}_block1",
            )((x, skip), t)
            skip = skips.pop()
            sf = skip_folds.pop()
            if f_out == 1 and sf > 1:
                skip = unfold_width(skip, sf)
            x = ResnetBlock(
                dim_out, time_emb_dim=time_dim, groups=self.resnet_block_groups,
                dtype=self.dtype, fold=f_out, name=f"ups_{ind}_block2",
            )((x, skip), t)
            if self.use_iso_attn:
                x = AttnBlock(4, 32, dtype=self.dtype, fold=f_out,
                              name=f"ups_{ind}_attn")(x, iso_emb)
            if not is_last:
                if f_out > 1 and f_in > 1:
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

        if self.use_position:
            x = ResnetBlock2(
                dim, pos_emb_dim=self.pos_dim, groups=2, dtype=self.dtype,
                fold=F, name="pos_block2",
            )(x, pos_emb)
        else:
            x = ResnetBlock(dim, groups=2, dtype=self.dtype, fold=F,
                            name="pos_block2")(x)

        x = ResnetBlock(
            dim, time_emb_dim=time_dim, groups=self.resnet_block_groups,
            dtype=self.dtype, fold=F, name="final_res_block",
        )((x, r), t)
        # packed strided-conv head: same inference-only trick as
        # NoiseDiffNet's dual heads (blocks.packed_narrow_conv; the
        # generation CLI sets the flag, trainers leave it off)
        if (
            os.environ.get("NOISEDIFF_PACKED_HEADS", "") == "1"
            and F > 1
            and x.shape[2] % 2 == 0
        ):
            from .blocks import _ConvParamBank, packed_narrow_conv

            w, b = _ConvParamBank((1, 1), dim, self.channels,
                                  name="final_conv")()
            y = packed_narrow_conv(x.astype(self.dtype or x.dtype),
                                   w[0, 0], b, F)
        else:
            y = Conv(self.channels, 1, dtype=self.dtype, fold=F,
                     name="final_conv")(x)
        if F > 1:
            y = unfold_width(y, F)
        return y


def UNet_PosEmbV2(dim=48, channels=4, cond_dim=4, dtype=None, **kw):
    return PosEmbUNet(
        dim=dim, channels=channels, cond_dim=cond_dim,
        use_position=True, use_iso_attn=False, dtype=dtype, **kw,
    )


def UNet_PosEmbV2_NoPosition(dim=48, channels=4, cond_dim=4, dtype=None, **kw):
    return PosEmbUNet(
        dim=dim, channels=channels, cond_dim=cond_dim,
        use_position=False, use_iso_attn=False, dtype=dtype, **kw,
    )


def UNet_PosEmbV2_CameraCond(dim=48, channels=4, cond_dim=4, dtype=None, **kw):
    return PosEmbUNet(
        dim=dim, channels=channels, cond_dim=cond_dim,
        use_position=True, use_iso_attn=True, dtype=dtype, **kw,
    )
