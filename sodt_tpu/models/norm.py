"""Drop-in LayerNorm modules backed by the fused Pallas kernels.

Same parameter names/shapes as flax nn.LayerNorm ({"scale", "bias"}), so
weight import and the golden-parity tests are unaffected; on TPU the
forward runs as a single-pass VMEM kernel (pallas/layernorm.py), elsewhere
as an equivalent f32 XLA expression.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..pallas.layernorm import layernorm, add_layernorm

DType = Any


class FusedLayerNorm(nn.Module):
    epsilon: float = 1e-5
    dtype: DType = jnp.float32
    scale_init: Any = nn.initializers.ones

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", self.scale_init, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return layernorm(x, scale, bias, self.epsilon)


class FusedAddLayerNorm(nn.Module):
    """Residual + LN in one pass: (a, b) -> (a + b, LN(a + b))."""

    epsilon: float = 1e-5
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, a, b):
        c = a.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return add_layernorm(a, b, scale, bias, self.epsilon)
