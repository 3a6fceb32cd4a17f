"""YOLO-family CNN building blocks as flax.linen modules, NHWC, TPU-native.

Functional re-design of the module vocabulary in
/root/reference/basics/models/common.py (Conv/Bottleneck/C3/SPP/Focus/MF/SE
and friends) and experimental.py (CrossConv/GhostConv/MixConv2d): same
computation graphs and channel arithmetic, expressed as flax modules with

  * NHWC layout (TPU conv-friendly; the reference is NCHW),
  * a `dtype` knob for bf16 MXU compute with f32 params,
  * BatchNorm carried in flax `batch_stats` collections with the YOLOv5
    eps/momentum convention (eps 1e-3, torch momentum 0.03 -> flax 0.97;
    reference torch_utils.initialize_weights),
  * cross-replica BN for free: under jit + NamedSharding data parallelism
    the batch mean/var reductions are global (XLA inserts the collectives),
    which subsumes both reference SyncBN paths (Train.py:207-209 and the
    vendored sync_batchnorm/).

All spatial shapes stay static under jit.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

DType = Any


def autopad(k: int, p: int | None = None) -> int:
    """'same' padding for odd kernels (reference common.py:26-30)."""
    return k // 2 if p is None else p


def silu(x):
    return x * jax.nn.sigmoid(x)


def leaky_relu_01(x):
    return jax.nn.leaky_relu(x, negative_slope=0.1)


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


class ConvBnAct(nn.Module):
    """Conv2d + BatchNorm + activation — the reference `Conv` (common.py:38-52).

    NHWC; bias-free conv; act defaults to SiLU. Set `act=None` for identity.
    k/s may be ints or (kh, kw)/(sh, sw) tuples (reference autopad handles
    both, common.py:26-30).
    """

    c2: int
    k: int | tuple = 1
    s: int | tuple = 1
    p: int | None = None
    g: int = 1
    act: Callable | None = silu
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kh, kw = (self.k, self.k) if isinstance(self.k, int) else self.k
        sh, sw = (self.s, self.s) if isinstance(self.s, int) else self.s
        ph = autopad(kh, self.p)
        pw = autopad(kw, self.p)
        x = nn.Conv(self.c2, (kh, kw), strides=(sh, sw),
                    padding=[(ph, ph), (pw, pw)], feature_group_count=self.g,
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=self.dtype, name="bn")(x)
        return self.act(x) if self.act is not None else x


def DWConvBnAct(c2: int, k: int = 1, s: int = 1, c1: int | None = None,
                act: Callable | None = silu,
                dtype: DType = jnp.float32, name: str | None = None
                ) -> ConvBnAct:
    """Depthwise conv block (reference common.py:33-35)."""
    g = math.gcd(c1, c2) if c1 else c2
    return ConvBnAct(c2=c2, k=k, s=s, g=g, act=act, dtype=dtype, name=name)


class Bottleneck(nn.Module):
    """Standard residual bottleneck (common.py:55-65)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = ConvBnAct(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        y = ConvBnAct(self.c2, 3, 1, g=self.g, dtype=self.dtype,
                      name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.c2:
            return x + y
        return y


class C3(nn.Module):
    """CSP bottleneck with 3 convs (common.py:114-127)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = ConvBnAct(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            y1 = Bottleneck(c_, self.shortcut, self.g, e=1.0,
                            dtype=self.dtype, name=f"m{i}")(y1, train)
        y2 = ConvBnAct(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        y = jnp.concatenate([y1, y2], axis=-1)
        return ConvBnAct(self.c2, 1, dtype=self.dtype, name="cv3")(y, train)


class BottleneckCSP(nn.Module):
    """CSP bottleneck, v4-style (common.py:78-94)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = ConvBnAct(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            y1 = Bottleneck(c_, self.shortcut, self.g, e=1.0,
                            dtype=self.dtype, name=f"m{i}")(y1, train)
        y1 = nn.Conv(c_, (1, 1), use_bias=False, dtype=self.dtype,
                     name="cv3")(y1)
        y2 = nn.Conv(c_, (1, 1), use_bias=False, dtype=self.dtype,
                     name="cv2")(x)
        y = jnp.concatenate([y1, y2], axis=-1)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=self.dtype, name="bn")(y)
        y = leaky_relu_01(y)
        return ConvBnAct(self.c2, 1, 1, dtype=self.dtype, name="cv4")(y, train)


class BottleneckCSP2(nn.Module):
    """CSP2 variant (common.py:96-112)."""

    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2)
        x1 = ConvBnAct(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        y1 = x1
        for i in range(self.n):
            y1 = Bottleneck(c_, self.shortcut, self.g, e=1.0,
                            dtype=self.dtype, name=f"m{i}")(y1, train)
        y2 = nn.Conv(c_, (1, 1), use_bias=False, dtype=self.dtype,
                     name="cv2")(x1)
        y = jnp.concatenate([y1, y2], axis=-1)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=self.dtype, name="bn")(y)
        y = leaky_relu_01(y)
        return ConvBnAct(self.c2, 1, 1, dtype=self.dtype, name="cv3")(y, train)


class SPP(nn.Module):
    """Spatial pyramid pooling (common.py:129-140)."""

    c2: int
    k: Sequence[int] = (5, 9, 13)
    c1: int | None = None
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = self.c1 or x.shape[-1]
        c_ = c1 // 2
        x = ConvBnAct(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        pools = [x]
        for k in self.k:
            pools.append(nn.max_pool(x, (k, k), strides=(1, 1),
                                     padding=[(k // 2, k // 2)] * 2))
        y = jnp.concatenate(pools, axis=-1)
        return ConvBnAct(self.c2, 1, 1, dtype=self.dtype, name="cv2")(y, train)


class SPPCSP(nn.Module):
    """CSP-wrapped SPP (common.py:142-162)."""

    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5
    k: Sequence[int] = (5, 9, 13)
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(2 * self.c2 * self.e)
        x1 = ConvBnAct(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        x1 = ConvBnAct(c_, 3, 1, dtype=self.dtype, name="cv3")(x1, train)
        x1 = ConvBnAct(c_, 1, 1, dtype=self.dtype, name="cv4")(x1, train)
        pools = [x1]
        for k in self.k:
            pools.append(nn.max_pool(x1, (k, k), strides=(1, 1),
                                     padding=[(k // 2, k // 2)] * 2))
        y1 = ConvBnAct(c_, 1, 1, dtype=self.dtype,
                       name="cv5")(jnp.concatenate(pools, -1), train)
        y1 = ConvBnAct(c_, 3, 1, dtype=self.dtype, name="cv6")(y1, train)
        y2 = nn.Conv(c_, (1, 1), use_bias=False, dtype=self.dtype,
                     name="cv2")(x)
        y = jnp.concatenate([y1, y2], axis=-1)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=self.dtype, name="bn")(y)
        y = mish(y)
        return ConvBnAct(self.c2, 1, 1, dtype=self.dtype, name="cv7")(y, train)


class Focus(nn.Module):
    """Space-to-depth stem (common.py:67-76): 2x2 pixel-unshuffle then Conv."""

    c2: int
    k: int = 1
    s: int = 1
    p: int | None = None
    g: int = 1
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # NHWC slice-concat matching torch channel order
        patches = jnp.concatenate(
            [x[:, ::2, ::2, :], x[:, 1::2, ::2, :],
             x[:, ::2, 1::2, :], x[:, 1::2, 1::2, :]], axis=-1)
        return ConvBnAct(self.c2, self.k, self.s, self.p, self.g,
                         dtype=self.dtype, name="conv")(patches, train)


class Contract(nn.Module):
    """Fold 2x2 space into channels (common.py:247-258)."""

    gain: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        s = self.gain
        x = x.reshape(n, h // s, s, w // s, s, c)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(n, h // s, w // s, c * s * s)


class Expand(nn.Module):
    """Unfold channels into 2x2 space (common.py:261-272)."""

    gain: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        s = self.gain
        x = x.reshape(n, h, w, s, s, c // (s * s))
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(n, h * s, w * s, c // (s * s))


class Upsample(nn.Module):
    """Nearest / bilinear upsample (the reference uses nn.Upsample in YAML)."""

    scale: int = 2
    method: str = "nearest"

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        if self.method == "nearest":
            x = jnp.repeat(jnp.repeat(x, self.scale, axis=1), self.scale, axis=2)
            return x
        return jax.image.resize(x, (n, h * self.scale, w * self.scale, c),
                                method=self.method)


class SEBlock(nn.Module):
    """Squeeze-and-excitation (common.py:165-180)."""

    reduction: int = 16
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2))  # global average pool
        y = nn.Dense(c // self.reduction, use_bias=False, dtype=self.dtype,
                     name="fc1")(y)
        y = jax.nn.relu(y)
        y = nn.Dense(c, use_bias=False, dtype=self.dtype, name="fc2")(y)
        y = jax.nn.sigmoid(y)
        return x * y[:, None, None, :]


class MF(nn.Module):
    """SuperYOLO multimodal (RGB+IR) fusion block (common.py:183-212).

    Input: tuple/list (rgb NHW3, ir NHW1); output NHW64 fused feature.
    """

    channels: int = 3
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        rgb_ori, ir_ori = x[0], x[1]
        rgb = SEBlock(reduction=self.channels, dtype=self.dtype,
                      name="se_r")(rgb_ori, train)
        ir = SEBlock(reduction=1, dtype=self.dtype, name="se_i")(ir_ori, train)

        mask_r = nn.Conv(1, (1, 1), use_bias=True, dtype=self.dtype,
                         name="mask_map_r")(rgb)
        mask_i = nn.Conv(1, (1, 1), use_bias=True, dtype=self.dtype,
                         name="mask_map_i")(ir)
        masked_rgb = jnp.repeat(mask_r, 3, axis=-1) * rgb
        masked_ir = mask_i * ir

        out_ir = nn.Conv(16, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                         dtype=self.dtype, name="bottleneck1")(masked_ir + ir_ori)
        out_rgb = nn.Conv(48, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                          dtype=self.dtype, name="bottleneck2")(masked_rgb + rgb_ori)
        out = jnp.concatenate([out_rgb, out_ir], axis=-1)
        return SEBlock(reduction=16, dtype=self.dtype, name="se")(out, train)


class CrossConv(nn.Module):
    """(1,k) then (k,1) cross convolution, each a full Conv+BN+SiLU block
    (experimental.py:11-25)."""

    c2: int
    k: int = 3
    s: int = 1
    g: int = 1
    e: float = 1.0
    shortcut: bool = False
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = ConvBnAct(c_, (1, self.k), (1, self.s), dtype=self.dtype,
                      name="cv1")(x, train)
        y = ConvBnAct(self.c2, (self.k, 1), (self.s, 1), g=self.g,
                      dtype=self.dtype, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.c2:
            return x + y
        return y


class GhostConv(nn.Module):
    """Ghost convolution (experimental.py:46-55). `act=None` gives the
    pw-linear variant used inside GhostBottleneck."""

    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    act: Callable | None = silu
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = ConvBnAct(c_, self.k, self.s, g=self.g, act=self.act,
                      dtype=self.dtype, name="cv1")(x, train)
        y2 = ConvBnAct(c_, 5, 1, g=c_, act=self.act, dtype=self.dtype,
                       name="cv2")(y, train)
        return jnp.concatenate([y, y2], axis=-1)


class GhostBottleneck(nn.Module):
    """Ghost bottleneck (experimental.py:58-72): pw GhostConv -> optional
    s=2 depthwise -> pw-linear GhostConv, ALWAYS summed with a shortcut
    branch (identity at s=1; DWConv+Conv at s=2)."""

    c2: int
    k: int = 3
    s: int = 1
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = GhostConv(c_, 1, 1, dtype=self.dtype, name="g1")(x, train)
        if self.s == 2:
            y = DWConvBnAct(c_, self.k, self.s, c1=c_, act=None,
                            dtype=self.dtype, name="dw")(y, train)
        y = GhostConv(self.c2, 1, 1, act=None, dtype=self.dtype,
                      name="g2")(y, train)
        if self.s == 2:
            sc = DWConvBnAct(x.shape[-1], self.k, self.s, c1=x.shape[-1],
                             act=None, dtype=self.dtype, name="sc_dw")(x, train)
            sc = ConvBnAct(self.c2, 1, 1, act=None, dtype=self.dtype,
                           name="sc_pw")(sc, train)
            return y + sc
        return y + x  # identity shortcut (requires c1 == c2 like the ref)


class MixConv2d(nn.Module):
    """Mixed-kernel-size grouped conv (experimental.py:88-95)."""

    c2: int
    k: Sequence[int] = (1, 3)
    s: int = 1
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        groups = len(self.k)
        # equal channel split per kernel size (reference equal_ch=True path)
        splits = [self.c2 // groups] * groups
        splits[0] += self.c2 - sum(splits)
        outs = []
        for i, (k, c) in enumerate(zip(self.k, splits)):
            pad = k // 2
            outs.append(nn.Conv(c, (k, k), strides=(self.s, self.s),
                                padding=[(pad, pad)] * 2, use_bias=False,
                                dtype=self.dtype, name=f"m{i}")(x))
        y = jnp.concatenate(outs, axis=-1)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=self.dtype, name="bn")(y)
        # residual (experimental.py:95) — requires c1 == c2 like the ref
        return x + leaky_relu_01(y)


class AttentionModel(nn.Module):
    """Sigmoid spatial attention residual (common.py:448-458)."""

    c2: int
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        amap = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)], use_bias=True,
                       dtype=self.dtype, name="conv")(x)
        amap = jax.nn.sigmoid(amap)
        return x + x * jnp.exp(amap)


class ScaledDotProductAttentionOnly(nn.Module):
    """Channel-token attention over flattened HW (common.py:214-244)."""

    temperature: float = 1.0

    @nn.compact
    def __call__(self, qkv, train: bool = False):
        v, k, q = qkv
        b, h, w, c = q.shape
        qf = q.reshape(b, h * w, c).transpose(0, 2, 1)  # (b, c, hw)
        kf = k.reshape(b, h * w, c).transpose(0, 2, 1)
        vf = v.reshape(b, h * w, c).transpose(0, 2, 1)
        attn = jnp.einsum("bcn,bdn->bcd", qf / self.temperature, kf)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bcd,bdn->bcn", attn, vf)
        return out.transpose(0, 2, 1).reshape(b, h, w, c)


class Concat(nn.Module):
    """Channel concat of a list of NHWC maps (common.py:275-282)."""

    @nn.compact
    def __call__(self, xs, train: bool = False):
        return jnp.concatenate(xs, axis=-1)


class ACmix(nn.Module):
    """Mixed local-attention + shared-projection conv operator
    (common.py:485-561, ACmix paper). NHWC.

    Shares q/k/v 1x1 projections between (a) kernel_att-neighborhood local
    attention with a learned 2ch->head_dim positional encoding and (b) a
    depthwise conv branch fed by a 1x1 'fc' over stacked q/k/v heads;
    learnable mixing rates initialized to 0.5 each.
    """

    c2: int
    kernel_att: int = 7
    head: int = 4
    kernel_conv: int = 3
    s: int = 1
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c1 = x.shape
        co = self.c2
        hd = co // self.head
        ka = self.kernel_att
        pad = (ka - 1 + 1) // 2

        q = nn.Conv(co, (1, 1), dtype=self.dtype, name="conv1")(x)
        k = nn.Conv(co, (1, 1), dtype=self.dtype, name="conv2")(x)
        v = nn.Conv(co, (1, 1), dtype=self.dtype, name="conv3")(x)

        # positional encoding (common.py:461-469): 2ch coordinate map
        loc_w = jnp.linspace(-1.0, 1.0, w)[None, :].repeat(h, axis=0)
        loc_h = jnp.linspace(-1.0, 1.0, h)[:, None].repeat(w, axis=1)
        pe_in = jnp.stack([loc_w, loc_h], axis=-1)[None]  # (1, h, w, 2)
        pe = nn.Conv(hd, (1, 1), dtype=self.dtype, name="conv_p")(pe_in)

        scaling = float(hd) ** -0.5
        h_out, w_out = h // self.s, w // self.s

        def heads(t):  # (b, h, w, head*hd) -> (b*head, h, w, hd)
            t = t.reshape(b, h, w, self.head, hd)
            return t.transpose(0, 3, 1, 2, 4).reshape(b * self.head, h, w, hd)

        q_att = heads(q) * scaling
        k_att = heads(k)
        v_att = heads(v)
        if self.s > 1:
            q_att = q_att[:, ::self.s, ::self.s]
            q_pe = pe[:, ::self.s, ::self.s]
        else:
            q_pe = pe

        def unfold(t):  # reflect-pad then extract ka x ka patches
            t = jnp.pad(t, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                        mode="reflect")
            # NCHW patches: (B, C*ka*ka, H', W') with C slowest
            tn = t.transpose(0, 3, 1, 2)
            p = jax.lax.conv_general_dilated_patches(
                tn, (ka, ka), (self.s, self.s), "VALID")
            bb = t.shape[0]
            return p.reshape(bb, hd, ka * ka, h_out, w_out)

        unfold_k = unfold(k_att)
        unfold_rpe = unfold(pe)
        q_att_n = q_att.transpose(0, 3, 1, 2)[:, :, None]      # (B*hd,hd,1,h,w)
        q_pe_n = q_pe.transpose(0, 3, 1, 2)[:, :, None]
        att = (q_att_n * (unfold_k + q_pe_n - unfold_rpe)).sum(1)
        att = jax.nn.softmax(att, axis=1)                      # over ka^2
        out_att = (att[:, None] * unfold(v_att)).sum(2)        # (B*h, hd, ho, wo)
        out_att = out_att.reshape(b, self.head, hd, h_out, w_out)
        out_att = out_att.transpose(0, 3, 4, 1, 2).reshape(b, h_out, w_out, co)

        # conv branch: fc over stacked q/k/v head maps -> depthwise conv
        def head_stack(t):  # (b, h, w, co) -> (b, h*w, head)
            return t.reshape(b, h * w, self.head, hd)
        f_all = jnp.concatenate([head_stack(q), head_stack(k),
                                 head_stack(v)], axis=2)       # (b,hw,3head,hd)
        f_all = f_all.transpose(0, 1, 3, 2).reshape(b, h * w, hd, 3 * self.head)
        f_fc = nn.Dense(self.kernel_conv ** 2, use_bias=False,
                        dtype=self.dtype, name="fc")(f_all)    # (b,hw,hd,k^2)
        f_conv = f_fc.reshape(b, h, w, hd * self.kernel_conv ** 2)
        # reference reset_parameters assigns dep_conv.bias = init_rate_0(...)
        # which returns None -> the bias is literally removed (common.py:521)
        pc = self.kernel_conv // 2
        out_conv = nn.Conv(co, (self.kernel_conv, self.kernel_conv),
                           strides=(self.s, self.s),
                           padding=[(pc, pc), (pc, pc)],
                           feature_group_count=hd, use_bias=False,
                           dtype=self.dtype, name="dep_conv")(f_conv)

        rate1 = self.param("rate1", lambda k_, s_: jnp.full(s_, 0.5), (1,))
        rate2 = self.param("rate2", lambda k_, s_: jnp.full(s_, 0.5), (1,))
        return rate1 * out_att + rate2 * out_conv


class Classify(nn.Module):
    """Classification head (common.py:431-444): global pool + 1x1 conv."""

    c2: int
    k: int = 1
    s: int = 1
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        xs = x if isinstance(x, (list, tuple)) else [x]
        pooled = [jnp.mean(t, axis=(1, 2), keepdims=True) for t in xs]
        y = jnp.concatenate(pooled, axis=-1)
        y = nn.Conv(self.c2, (self.k, self.k), strides=(self.s, self.s),
                    dtype=self.dtype, name="conv")(y)
        return y.reshape(y.shape[0], -1)


class Sum(nn.Module):
    """Weighted sum of inputs (experimental.py:28-43): optionally learned
    sigmoid-scaled weights over n-1 later inputs."""

    n: int
    weight: bool = False

    @nn.compact
    def __call__(self, xs, train: bool = False):
        y = xs[0]
        if self.weight:
            # init -arange(1, n)/2 (experimental.py:33)
            w = self.param("w",
                           lambda k, s: -jnp.arange(1.0, s[0] + 1.0) / 2.0,
                           (self.n - 1,))
            w = jax.nn.sigmoid(w) * 2.0
            for i in range(self.n - 1):
                y = y + xs[i + 1] * w[i]
        else:
            for i in range(self.n - 1):
                y = y + xs[i + 1]
        return y
