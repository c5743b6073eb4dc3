"""Shared layers: normalizations and initializers with reference semantics.

The reference mixes four normalization flavors whose exact reduction axes
matter for checkpoint parity:

- ``InstanceNorm2d/1d`` with affine=False (image encoder & score heads,
  imagenet.py:123, network.py:31/42-43): per-sample per-channel stats over
  the spatial/point axis, no parameters;
- ``GroupNorm(32, C)`` applied to a whole point cloud at once
  (modules.py:32-49 wraps (N, C) -> (1, C, N)): stats over (C/G, N) jointly,
  affine per channel;
- ``LayerNorm`` (transformer + pc projection head), eps 1e-5;
- ``BatchNorm2d`` (image decoder ResidualConv, imagenet.py:381-394):
  batch stats + affine.

Initializers mirror the torch defaults the reference trains with so
training dynamics are comparable.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

# torch nn.Linear / nn.Conv default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))
torch_linear_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
# torch kaiming_normal_(mode='fan_out', nonlinearity='relu') (imagenet.py:157)
kaiming_out_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
xavier_init = nn.initializers.xavier_uniform()


def torch_bias_init(key, shape, dtype, fan_in: int):
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def instance_norm(x: jax.Array, spatial_axes: tuple, eps: float = 1e-5) -> jax.Array:
    """Parameter-free instance norm over the given axes (biased variance,
    matching torch InstanceNorm with affine=False).  Statistics always in
    fp32 so bf16 activations stay stable."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=spatial_axes, keepdims=True)
    var = jnp.var(x32, axis=spatial_axes, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _gn_normalize(x: jax.Array, g: int, eps: float) -> jax.Array:
    """Whole-cloud group statistics + normalize (fp32), pre-affine.

    Module-level so tools/fpn_bisect can stub it for in-context cost
    attribution (the same late-bound-attribute pattern as the kernel stubs).
    """
    shape = x.shape[:-2] + (x.shape[-2], g, x.shape[-1] // g)
    xg = x.astype(jnp.float32).reshape(shape)
    mean = jnp.mean(xg, axis=(-3, -1), keepdims=True)
    var = jnp.var(xg, axis=(-3, -1), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    return xg.reshape(x.shape)


class PointGroupNorm(nn.Module):
    """GroupNorm over an entire point cloud.

    Input (..., N, C); statistics per (batch, group) over all N points and
    the C/G channels of the group — the reference semantics of GroupNorm on
    a (1, C, N) tensor (modules.py:43-49).
    """

    num_groups: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        g = self.num_groups
        assert c % g == 0, (c, g)
        dtype = x.dtype
        out = _gn_normalize(x, g, self.eps)
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return (out * scale + bias).astype(dtype)


class TorchLayerNorm(nn.Module):
    """LayerNorm over the last axis, eps 1e-5 (torch default)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.LayerNorm(epsilon=1e-5)(x)


class Linear(nn.Module):
    """Dense layer with torch-default initialization.

    ``dtype`` sets the computation dtype (params stay fp32): bf16 here puts
    the matmul on the MXU's fast path.
    """

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        fan_in = x.shape[-1]
        bias_init = lambda k, s, d=jnp.float32: torch_bias_init(k, s, d, fan_in)
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=torch_linear_init,
            bias_init=bias_init,
            dtype=self.dtype,
        )(x)


def norm_factory(norm: str, group_norm: int):
    """Reference get_norm (modules.py:51-60): 'gn' | 'ln' | 'bn' for point feats."""
    if norm == "gn":
        return PointGroupNorm(group_norm)
    if norm == "ln":
        return TorchLayerNorm()
    raise ValueError(f"unsupported point-branch norm {norm!r} (reference supports bn/ln/gn; only gn/ln are used)")


def leaky_relu(x: jax.Array, negative_slope: float = 0.1) -> jax.Array:
    return jnp.where(x >= 0, x, negative_slope * x)
