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

    @property
    def downsample_factor(self) -> int:
        return 2 ** (len(self.dim_mults) - 1)

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

        # positional condition: fourier features of the coord grid -> MLP
        pos_emb = LearnedSinusoidalPosEmb(self.pos_dim, dtype=self.dtype, name="pos_enc")(
            position
        )
        pos_emb = Mlp(
            self.pos_dim * 2, self.pos_dim, act=_gelu, dtype=self.dtype, name="pos_mlp"
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

        # shot-noise branch: pixelwise signal-dependent head (:566-604)
        shot = Mlp(dim, dim, act=_gelu, dtype=self.dtype, name="shot_mlp1")(
            jnp.concatenate([clean_img, x], axis=-1)
        )
        shot_res = shot
        shot = AttnBlock(
            self.attn_heads, self.attn_dim_head, dtype=self.dtype, name="shot_attn"
        )(shot, iso_emb)
        shot = Mlp(dim, dim, act=_gelu, dtype=self.dtype, name="shot_mlp2")(shot)
        shot = Res(
            dim, time_emb_dim=time_dim, groups=2, dtype=self.dtype, name="shot_time"
        )(shot, t)
        shot = shot + shot_res
        shot_noise = Mlp(dim, self.channels, act=_gelu, dtype=self.dtype, name="shot_mlp3")(
            shot
        )

        # UNet trunk (read-noise branch)
        x = Conv(dim, 7, dtype=self.dtype, name="init_conv")(x)
        r = x
        x = ResnetBlock2(
            dim, pos_emb_dim=self.pos_dim, groups=2, dtype=self.dtype, name="pos_block1"
        )(x, pos_emb)

        skips = []
        for ind, (dim_in, dim_out) in enumerate(in_out):
            is_last = ind >= num_stages - 1
            x = Res(
                dim_in, time_emb_dim=time_dim, groups=self.resnet_block_groups,
                dtype=self.dtype, name=f"downs_{ind}_block1",
            )(x, t)
            skips.append(x)
            x = Res(
                dim_in, time_emb_dim=time_dim, groups=self.resnet_block_groups,
                dtype=self.dtype, name=f"downs_{ind}_block2",
            )(x, t)
            skips.append(x)
            x = AttnBlock(
                self.attn_heads, self.attn_dim_head, dtype=self.dtype,
                name=f"downs_{ind}_attn",
            )(x, iso_emb)
            if not is_last:
                x = Downsample(dim_out, dtype=self.dtype, name=f"downs_{ind}_down")(x)
            else:
                x = Conv(dim_out, 3, dtype=self.dtype, name=f"downs_{ind}_down")(x)

        mid_dim = dims[-1]
        x = Res(
            mid_dim, time_emb_dim=time_dim, groups=self.resnet_block_groups,
            dtype=self.dtype, name="mid_block1",
        )(x, t)
        x = Res(
            mid_dim, time_emb_dim=time_dim, groups=self.resnet_block_groups,
            dtype=self.dtype, name="mid_block2",
        )(x, t)

        for ind, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = ind == num_stages - 1
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = Res(
                dim_out, time_emb_dim=time_dim, groups=self.resnet_block_groups,
                dtype=self.dtype, name=f"ups_{ind}_block1",
            )(x, t)
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = Res(
                dim_out, time_emb_dim=time_dim, groups=self.resnet_block_groups,
                dtype=self.dtype, name=f"ups_{ind}_block2",
            )(x, t)
            x = AttnBlock(
                self.attn_heads, self.attn_dim_head, dtype=self.dtype,
                name=f"ups_{ind}_attn",
            )(x, iso_emb)
            if not is_last:
                x = Upsample(dim_in, dtype=self.dtype, name=f"ups_{ind}_up")(x)
            else:
                x = Conv(dim_in, 3, dtype=self.dtype, name=f"ups_{ind}_up")(x)

        x = ResnetBlock2(
            dim, pos_emb_dim=self.pos_dim, groups=2, dtype=self.dtype, name="pos_block2"
        )(x, pos_emb)

        x = jnp.concatenate([x, r], axis=-1)
        x = Res(
            dim, time_emb_dim=time_dim, groups=self.resnet_block_groups,
            dtype=self.dtype, name="final_res_block",
        )(x, t)
        read_noise = Conv(self.channels, 1, dtype=self.dtype, name="final_conv")(x)
        return shot_noise + read_noise
