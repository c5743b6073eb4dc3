"""ResNet-34 image encoder (NHWC, InstanceNorm), TPU-native.

Capability match for the reference image branch
(/root/reference/model/imagenet.py:119-217, 356-373): a torchvision-style
ResNet-34 whose norm layer is parameter-free InstanceNorm2d, returning a
6-element feature pyramid (/2, /4, /8, /16, /32, global-avg).

TPU-first choices: NHWC layout (XLA's native conv layout), fused
instance-norm as pure elementwise math (no params, no running stats — same
as the reference's affine=False InstanceNorm), bf16-friendly convs.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from cofii2p_tpu.models.layers import instance_norm, kaiming_out_init


class Conv(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            use_bias=False,
            kernel_init=kaiming_out_init,
            dtype=self.dtype,
        )(x)


class BasicBlock(nn.Module):
    """Two 3x3 convs + instance norms with identity/projection shortcut
    (reference imagenet.py:36-73)."""

    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        out = Conv(self.features, 3, self.stride, dtype=self.dtype, name="conv1")(x)
        out = instance_norm(out, (1, 2))
        out = nn.relu(out)
        out = Conv(self.features, 3, 1, dtype=self.dtype, name="conv2")(out)
        out = instance_norm(out, (1, 2))
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = Conv(
                self.features, 1, self.stride, dtype=self.dtype, name="downsample"
            )(x)
            identity = instance_norm(identity, (1, 2))
        return nn.relu(out + identity)


class ResNetEncoder(nn.Module):
    """ResNet image encoder returning the 6-scale pyramid.

    (reference forward: imagenet.py:196-217; resnet34 layout [3,4,6,3],
    imagenet.py:241-250)
    """

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    stage_features: Sequence[int] = (64, 128, 256, 512)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        out = []
        x = x.astype(self.dtype)
        x = Conv(64, 7, 2, dtype=self.dtype, name="conv1")(x)
        x = instance_norm(x, (1, 2))
        x = nn.relu(x)
        out.append(x)  # /2, 64ch

        # torch MaxPool2d(kernel_size=3, stride=2, padding=1) pads with -inf
        x = nn.max_pool(
            jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf),
            (3, 3),
            strides=(2, 2),
        )

        for stage, (blocks, feats) in enumerate(
            zip(self.stage_sizes, self.stage_features)
        ):
            stride = 1 if stage == 0 else 2
            for b in range(blocks):
                x = BasicBlock(
                    feats,
                    stride if b == 0 else 1,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{b}",
                )(x)
            out.append(x)  # /4, /8, /16, /32

        out.append(jnp.mean(x, axis=(1, 2), keepdims=True))  # global avg (B,1,1,512)
        return out


class ResidualConv(nn.Module):
    """Decoder residual conv with BatchNorm (reference imagenet.py:377-411)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        identity = Conv(self.features, 3, 1, dtype=self.dtype, name="conv_skip")(x)
        identity = bn("bn_skip")(identity)
        out = Conv(self.features, 3, 1, dtype=self.dtype, name="conv1")(x)
        out = bn("bn1")(out)
        out = nn.relu(out)
        out = Conv(self.features, 3, 1, dtype=self.dtype, name="conv2")(out)
        out = bn("bn2")(out)
        return nn.relu(out + identity)


class ImageUpSample(nn.Module):
    """Bilinear x2 upsample + skip concat + 2 residual convs
    (reference imagenet.py:431-444; used at network.py:39-40)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_coarse, x_skip, train: bool):
        b, h, w, c = x_coarse.shape
        up = jax.image.resize(x_coarse, (b, h * 2, w * 2, c), method="bilinear")
        x = jnp.concatenate([up, x_skip.astype(up.dtype)], axis=-1)
        x = ResidualConv(self.features, dtype=self.dtype, name="res1")(x, train)
        x = ResidualConv(self.features, dtype=self.dtype, name="res2")(x, train)
        return x
