"""Enhanced-SWIN backbone with cross-channel attention fusion.

Re-design of `ImageEncoderViT` in
/root/reference/basics/models/backbone_vit.py:11-272 as a flax module:

  input (B, H, W, 4) RGB+IR
    -> 4 per-channel patch embeds (kernel=patch_size, stride 4, 1->48ch;
       the R embed carries the reference's padding=(1,1) quirk while G/B/IR
       use padding=(0,0), backbone_vit.py:69-98)
    -> CAttentionBlock cross-channel fusion (48ch each)
    -> concat to 192 -> 1x1 patch embed to embed_dim + abs pos embed
    -> stage1: 6 Swin blocks @ (H/4)^2, win 8, shifts [0,2,0,2,0,2];
       taps after blocks 4 and 5 concatenated -> P3 (2*embed_dim)
    -> PatchMerging -> stage2: 4 blocks @ (H/8)^2 -> P4
    -> PatchMerging -> stage3: 1 global block @ (H/16)^2 -> P5
    -> 1x1 neck convs: P3 -> out_chans, P4 -> out_chans, P5 -> 2*out_chans

Returns [P3, P4, P5] as NHWC features with strides (4, 8, 16).
(The reference hardcodes Detect stride [4.] and only consumes these three
maps through the head graph; see model.py:130.)
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .swin import SwinBlock, PatchMerging, PatchEmbed
from .cattention import CAttentionBlock

DType = Any


class ImageEncoderViT(nn.Module):
    img_size: int = 512
    patch_size: int = 4
    embed_dim: int = 192
    in_chans: int = 4
    out_chans: int = 256
    window_size: int = 4  # ctor arg kept for config parity; stages use 8/8/32
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    use_abs_pos: bool = True
    chan_embed_dim: int = 48
    mono: bool = False  # backbone_vit_mono.py variant: plain RGB patch embed
    remat: bool = False  # jax.checkpoint each Swin block (memory for FLOPs)
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        assert x.shape[-1] == self.in_chans, (x.shape, self.in_chans)
        ps = self.patch_size
        ce = self.chan_embed_dim

        if self.mono:
            # RGB-only variant (backbone_vit_mono.py:51-57): one patch embed
            # at stride patch_size, no cross-channel attention
            x = PatchEmbed(self.embed_dim, kernel=(ps, ps), stride=(ps, ps),
                           padding=(0, 0), dtype=self.dtype,
                           name="patch_embed")(x)
        else:
            # per-channel patch embedding (1 -> 48ch each, stride 4)
            def chan_embed(name, pad):
                return PatchEmbed(ce, kernel=(ps, ps), stride=(4, 4),
                                  padding=pad, dtype=self.dtype, name=name)

            r = chan_embed("channel_embed_r", (1, 1))(x[..., 0:1])
            g = chan_embed("channel_embed_g", (0, 0))(x[..., 1:2])
            b = chan_embed("channel_embed_b", (0, 0))(x[..., 2:3])
            ir = chan_embed("channel_embed_i", (0, 0))(x[..., 3:4])
            # the (1,1)-padded R map is one row/col larger at some sizes;
            # the reference relies on size-512/stride-4 equality — assert it
            assert r.shape == g.shape, (r.shape, g.shape)

            r, g, b, ir = CAttentionBlock(
                embedding_dim=ce, num_heads=self.num_heads, dtype=self.dtype,
                name="chan_block")(r, g, b, ir)
            x = jnp.concatenate([r, g, b, ir], axis=-1)  # (B, H/4, W/4, 192)

            x = PatchEmbed(self.embed_dim, kernel=(1, 1), stride=(1, 1),
                           padding=(0, 0), dtype=self.dtype,
                           name="patch_embed")(x)
        bsz, h, w, c = x.shape

        if self.use_abs_pos:
            pos = self.param("pos_embed", nn.initializers.zeros,
                             (1, self.img_size // 4, self.img_size // 4, c),
                             jnp.float32)
            if pos.shape[1:3] != (h, w):
                # Off-config sizes (val.py --task study sweeps 256..1536):
                # bilinearly resample the learned grid to the runtime grid.
                # The reference shape-errors here (backbone_vit.py:215-217);
                # silently *dropping* the embedding (round-2 behavior) is
                # worse than either. Exact at the config size by the guard.
                pos = jax.image.resize(pos, (1, h, w, c), method="bilinear")
            x = x + pos.astype(x.dtype)

        # stages run NHWC-native end to end (no token-layout round trips)
        Blk = nn.remat(SwinBlock) if self.remat else SwinBlock

        # stage 1 @ (h, w), taps at blocks 4 and 5
        shifts = (0, 2, 0, 2, 0, 2)
        taps = []
        for i in range(6):
            x = Blk(dim=self.embed_dim, input_resolution=(h, w),
                          num_heads=self.num_heads, window_size=8,
                          shift_size=shifts[i], mlp_ratio=self.mlp_ratio,
                          qkv_bias=self.qkv_bias,
                          linear_mlp=shifts[i] == 0, dtype=self.dtype,
                          name=f"stage1_{i}")(x)
            if i in (4, 5):
                taps.append(x)
        # taps concat -> P3 happens inside the neck below (sliced GEMMs)

        x = PatchMerging(self.embed_dim, dtype=self.dtype,
                         name="pmerging1")(x, (h, w))

        # stage 2 @ (h/2, w/2)
        h2, w2, c2 = h // 2, w // 2, 2 * self.embed_dim
        for i in range(4):
            x = Blk(dim=c2, input_resolution=(h2, w2),
                          num_heads=self.num_heads, window_size=8,
                          shift_size=shifts[i], mlp_ratio=self.mlp_ratio,
                          qkv_bias=self.qkv_bias,
                          linear_mlp=shifts[i] == 0, dtype=self.dtype,
                          name=f"stage2_{i}")(x)
        p4 = x

        x = PatchMerging(c2, dtype=self.dtype, name="pmerging2")(x, (h2, w2))

        # stage 3 @ (h/4, w/4): one global block (window = full map)
        h3, w3, c3 = h2 // 2, w2 // 2, 4 * self.embed_dim
        x = Blk(dim=c3, input_resolution=(h3, w3),
                      num_heads=self.num_heads, window_size=32, shift_size=0,
                      mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                      linear_mlp=True, dtype=self.dtype, name="stage3_0")(x)
        p5 = x

        # 1x1 necks (backbone_vit.py:167-187,265-270).
        # neck1 consumes the concat of the two stage-1 taps; computing it
        # as two sliced GEMMs summed (conv(concat(a,b), W) ==
        # a@W[:c] + b@W[c:]) skips materializing the (B, H, W, 2C) concat
        # in HBM (~4 ms pad/concat fusion at batch 64 in the round-3
        # profile). Param tree is the identical (1, 1, 2C, out) "neck1"
        # conv kernel, so checkpoints and weight import are unaffected.
        from .swin import ConvParams
        wn, _ = ConvParams(self.out_chans, (1, 1), use_bias=False,
                           name="neck1")(2 * self.embed_dim)
        wn = wn[0, 0].astype(self.dtype)              # (2C, out)
        c1 = self.embed_dim
        p3 = taps[0] @ wn[:c1] + taps[1] @ wn[c1:]
        p4 = nn.Conv(self.out_chans, (1, 1), use_bias=False, dtype=self.dtype,
                     name="neck2")(p4)
        p5 = nn.Conv(2 * self.out_chans, (1, 1), use_bias=False,
                     dtype=self.dtype, name="neck3")(p5)
        return [p3, p4, p5]
