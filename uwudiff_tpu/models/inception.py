"""Inception-v3 feature tower for FID evaluation.

TPU-native replacement for the torchmetrics/torch-fidelity InceptionV3
backbone the reference uses for FID (``duwu/metrics/fid.py:17-41`` via
``torchmetrics.image.fid.FrechetInceptionDistance``).  Architecture
follows the canonical Inception-v3 layout (torchvision naming), NHWC,
eval-only:

- every conv is bias-free and followed by a frozen BatchNorm (eps=1e-3)
  whose ``{scale, bias, mean, var}`` are ordinary params — this keeps
  the torch import one-to-one (``inception_key_map``) with no
  BN-folding surgery at load time;
- features are the 2048-dim global-average-pool ("pool3") activations,
  the exact FID feature layer.

Weights import from a locally-provided torchvision ``inception_v3``
or torch-fidelity ``pt_inception-2015-12-05`` state dict via
``models.import_torch.import_params(..., inception_key_map)``.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["InceptionV3Features", "FID_INPUT_SIZE"]

FID_INPUT_SIZE = 299


class FrozenBatchNorm(nn.Module):
    """Inference-mode batch norm with running stats held as params."""

    features: int
    eps: float = 1e-3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        shape = (self.features,)
        scale = self.param("scale", nn.initializers.ones, shape)
        bias = self.param("bias", nn.initializers.zeros, shape)
        mean = self.param("mean", nn.initializers.zeros, shape)
        var = self.param("var", nn.initializers.ones, shape)
        inv = scale / jnp.sqrt(var + self.eps)
        return x * inv.astype(self.dtype) + (bias - mean * inv).astype(
            self.dtype
        )


class BasicConv2d(nn.Module):
    """conv(no bias) + frozen BN + relu — torchvision ``BasicConv2d``."""

    features: int
    kernel: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    padding: Any = "VALID"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding=self.padding,
            use_bias=False,
            dtype=self.dtype,
            # He init keeps activation scale through the relu stack, so a
            # random-init tower is still a usable feature space (imported
            # weights overwrite this anyway)
            kernel_init=nn.initializers.he_normal(),
            name="conv",
        )(x)
        return nn.relu(
            FrozenBatchNorm(self.features, dtype=self.dtype, name="bn")(x)
        )


def _avg_pool_3x3_s1(x, count_include_pad: bool):
    """3x3 stride-1 avg pool, padding 1.

    torchvision counts padded zeros in the denominator
    (``count_include_pad=True``); the torch-fidelity FID weights variant
    does not. Both are exposed; FID protocol uses the latter.
    """
    summed = nn.pool(x, 0.0, jnp.add, (3, 3), (1, 1), ((1, 1), (1, 1)))
    if count_include_pad:
        return summed / 9.0
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    counts = nn.pool(ones, 0.0, jnp.add, (3, 3), (1, 1), ((1, 1), (1, 1)))
    return summed / counts


def _max_pool(x, window=3, stride=2):
    return nn.max_pool(x, (window, window), (stride, stride), "VALID")


class InceptionA(nn.Module):
    pool_features: int
    count_include_pad: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d, cip = self.dtype, self.count_include_pad
        b1 = BasicConv2d(64, (1, 1), dtype=d, name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), dtype=d, name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=2, dtype=d, name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), dtype=d, name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=1, dtype=d, name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=1, dtype=d, name="branch3x3dbl_3")(b3)
        bp = _avg_pool_3x3_s1(x, cip)
        bp = BasicConv2d(self.pool_features, (1, 1), dtype=d, name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), dtype=d, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), dtype=d, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=1, dtype=d, name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), dtype=d, name="branch3x3dbl_3")(bd)
        return jnp.concatenate([b3, bd, _max_pool(x)], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    count_include_pad: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d, c7, cip = self.dtype, self.channels_7x7, self.count_include_pad
        p17 = ((0, 0), (3, 3))  # (1,7) kernel pad
        p71 = ((3, 3), (0, 0))  # (7,1) kernel pad
        b1 = BasicConv2d(192, (1, 1), dtype=d, name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), dtype=d, name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=p17, dtype=d, name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=p71, dtype=d, name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), dtype=d, name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=p71, dtype=d, name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=p17, dtype=d, name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=p71, dtype=d, name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=p17, dtype=d, name="branch7x7dbl_5")(bd)
        bp = _avg_pool_3x3_s1(x, cip)
        bp = BasicConv2d(192, (1, 1), dtype=d, name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        p17 = ((0, 0), (3, 3))
        p71 = ((3, 3), (0, 0))
        b3 = BasicConv2d(192, (1, 1), dtype=d, name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), dtype=d, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), dtype=d, name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=p17, dtype=d, name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=p71, dtype=d, name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), dtype=d, name="branch7x7x3_4")(b7)
        return jnp.concatenate([b3, b7, _max_pool(x)], axis=-1)


class InceptionE(nn.Module):
    count_include_pad: bool = True
    pool_kind: str = "avg"  # torch-fidelity's final E-block uses max pool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d, cip = self.dtype, self.count_include_pad
        p01 = ((0, 0), (1, 1))  # (1,3) kernel pad
        p10 = ((1, 1), (0, 0))  # (3,1) kernel pad
        b1 = BasicConv2d(320, (1, 1), dtype=d, name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), dtype=d, name="branch3x3_1")(x)
        b3 = jnp.concatenate(
            [
                BasicConv2d(384, (1, 3), padding=p01, dtype=d, name="branch3x3_2a")(b3),
                BasicConv2d(384, (3, 1), padding=p10, dtype=d, name="branch3x3_2b")(b3),
            ],
            axis=-1,
        )
        bd = BasicConv2d(448, (1, 1), dtype=d, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=1, dtype=d, name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate(
            [
                BasicConv2d(384, (1, 3), padding=p01, dtype=d, name="branch3x3dbl_3a")(bd),
                BasicConv2d(384, (3, 1), padding=p10, dtype=d, name="branch3x3dbl_3b")(bd),
            ],
            axis=-1,
        )
        if self.pool_kind == "max":
            bp = nn.max_pool(x, (3, 3), (1, 1), ((1, 1), (1, 1)))
        else:
            bp = _avg_pool_3x3_s1(x, cip)
        bp = BasicConv2d(192, (1, 1), dtype=d, name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """Inception-v3 trunk -> 2048-dim pool3 features (NHWC).

    ``fid_variant=True`` reproduces the torch-fidelity FID network's two
    deviations from torchvision: padded zeros excluded from avg-pool
    denominators and a max pool in the last InceptionE block.
    """

    fid_variant: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [B, 299, 299, 3] in [-1, 1] (FID protocol scaling)."""
        d = self.dtype
        cip = not self.fid_variant
        x = x.astype(d)
        x = BasicConv2d(32, (3, 3), strides=(2, 2), dtype=d, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), dtype=d, name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=1, dtype=d, name="Conv2d_2b_3x3")(x)
        x = _max_pool(x)
        x = BasicConv2d(80, (1, 1), dtype=d, name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), dtype=d, name="Conv2d_4a_3x3")(x)
        x = _max_pool(x)
        x = InceptionA(32, count_include_pad=cip, dtype=d, name="Mixed_5b")(x)
        x = InceptionA(64, count_include_pad=cip, dtype=d, name="Mixed_5c")(x)
        x = InceptionA(64, count_include_pad=cip, dtype=d, name="Mixed_5d")(x)
        x = InceptionB(dtype=d, name="Mixed_6a")(x)
        x = InceptionC(128, count_include_pad=cip, dtype=d, name="Mixed_6b")(x)
        x = InceptionC(160, count_include_pad=cip, dtype=d, name="Mixed_6c")(x)
        x = InceptionC(160, count_include_pad=cip, dtype=d, name="Mixed_6d")(x)
        x = InceptionC(192, count_include_pad=cip, dtype=d, name="Mixed_6e")(x)
        x = InceptionD(dtype=d, name="Mixed_7a")(x)
        x = InceptionE(count_include_pad=cip, dtype=d, name="Mixed_7b")(x)
        x = InceptionE(
            count_include_pad=cip,
            pool_kind="max" if self.fid_variant else "avg",
            dtype=d,
            name="Mixed_7c",
        )(x)
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # [B, 2048]
