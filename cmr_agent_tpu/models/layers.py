"""Shared building blocks.

The reference expresses pointwise stacks as ``Conv1d(k=1)+BatchNorm1d``
(models/PointNN.py:96-123,260-282) and image stacks as 3x3
``Conv2d+BatchNorm2d`` residual blocks (models/ImageResNet.py:5-40). Here:

* every 1x1 Conv1d becomes a Dense on ``[B, N, C]`` — the same matmul, laid
  out for the MXU without transposes;
* 2-D convs run NHWC (XLA:TPU's preferred layout);
* BatchNorm keeps torch semantics (momentum 0.1 on batch stats ->
  flax ``momentum=0.9``, eps 1e-5) so converted checkpoints evaluate
  identically.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# torch's default Linear/Conv init: kaiming_uniform(a=sqrt(5)) ==
# U(-1/sqrt(fan_in), 1/sqrt(fan_in)); variance 1/(3 fan_in).
torch_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform")


def leaky(x, slope: float = 0.2):
    return nn.leaky_relu(x, negative_slope=slope)


class BatchNorm(nn.Module):
    """torch-semantics BatchNorm over the last axis.

    Batch statistics are always computed/stored in float32; in mixed
    precision (bf16 activations) the normalisation runs in f32 and casts
    back, which XLA fuses into the surrounding elementwise ops.
    """

    @nn.compact
    def __call__(self, x, train: bool):
        in_dtype = x.dtype
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32)(x.astype(jnp.float32))
        return y.astype(in_dtype)


class DenseBNLeaky(nn.Module):
    """Dense -> BatchNorm -> LeakyReLU(0.2) (a Conv1d(k=1)+BN1d+LReLU stack)."""

    features: int
    slope: float = 0.2
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Dense(self.features, kernel_init=torch_kernel_init,
                     dtype=self.dtype)(x)
        x = BatchNorm()(x, train)
        return leaky(x, self.slope)


class MiniPointNet(nn.Module):
    """3 x (Dense-BN-LeakyReLU(0.2)) shared point MLP (PointNN.py:96-123)."""

    features: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool):
        for _ in range(3):
            x = DenseBNLeaky(self.features, dtype=self.dtype)(x, train)
        return x


class ResDenseBlock(nn.Module):
    """Residual pointwise block — the reference's ConvBNReLURes1D
    (PointNN.py:260-282): Dense-BN-LReLU-Dense-BN (+ projected shortcut),
    final LReLU after the sum.
    """

    features: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool):
        in_features = x.shape[-1]
        dense = lambda f: nn.Dense(f, kernel_init=torch_kernel_init,
                                   dtype=self.dtype)
        h = dense(in_features)(x)
        h = BatchNorm()(h, train)
        h = leaky(h)
        h = dense(self.features)(h)
        h = BatchNorm()(h, train)
        if in_features == self.features:
            s = x
        else:
            s = dense(self.features)(x)
            s = BatchNorm()(s, train)
        return leaky(h + s)


class ResidualBlock2D(nn.Module):
    """3x3-conv residual block, NHWC (reference models/ImageResNet.py:5-40).

    ``stride`` 1 or 2; shortcut is identity / 1x1 conv / strided 3x3 conv
    exactly as the reference chooses them.
    """

    features: int
    stride: int = 1
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool):
        assert self.stride in (1, 2)
        in_features = x.shape[-1]
        conv = lambda f, k, st: nn.Conv(
            f, (k, k), strides=st, padding=k // 2,
            kernel_init=torch_kernel_init, dtype=self.dtype)
        h = conv(in_features, 3, self.stride)(x)
        h = BatchNorm()(h, train)
        h = leaky(h)
        h = conv(self.features, 3, 1)(h)
        h = BatchNorm()(h, train)

        if in_features != self.features and self.stride == 1:
            s = conv(self.features, 1, 1)(x)
            s = BatchNorm()(s, train)
        elif self.stride == 2:
            s = conv(self.features, 3, 2)(x)
            s = BatchNorm()(s, train)
        else:
            s = x
        return leaky(h + s)


class ViTAttention(nn.Module):
    """Multi-head softmax attention with output projection and dropouts.

    The self/cross attention used throughout the coarse stage (reference
    models/ImageViT.py:61-108, IMGPCEncoder.py:14-55). ``x`` attends to
    ``y`` (``x is y`` for self-attention).
    """

    num_heads: int
    dropout: float
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, y, train: bool):
        d = x.shape[-1]
        head_dim = d // self.num_heads
        dense = lambda name: nn.Dense(d, kernel_init=torch_kernel_init,
                                      name=name, dtype=self.dtype)

        def split(t):
            b, n, _ = t.shape
            return t.reshape(b, n, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        q = split(dense("query")(x))
        k = split(dense("key")(y))
        v = split(dense("value")(y))

        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(head_dim, x.dtype))
        probs = nn.softmax(scores, axis=-1)
        probs = nn.Dropout(self.dropout, deterministic=not train)(probs)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(x.shape)
        out = dense("out")(ctx)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class ViTMlp(nn.Module):
    """GELU MLP with xavier-uniform init (reference ImageViT.py:111-133)."""

    hidden_dim: int
    dropout: float
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool):
        d = x.shape[-1]
        x = nn.Dense(self.hidden_dim,
                     kernel_init=nn.initializers.xavier_uniform(),
                     bias_init=nn.initializers.normal(1e-6),
                     dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(d, kernel_init=nn.initializers.xavier_uniform(),
                     bias_init=nn.initializers.normal(1e-6),
                     dtype=self.dtype)(x)
        return nn.Dropout(self.dropout, deterministic=not train)(x)


class ViTBlock(nn.Module):
    """Pre-norm transformer block (self-attention)."""

    num_heads: int
    mlp_dim: int
    attention_dropout: float
    mlp_dropout: float
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool):
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        x = x + ViTAttention(self.num_heads, self.attention_dropout,
                             dtype=self.dtype)(h, h, train)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        return x + ViTMlp(self.mlp_dim, self.mlp_dropout,
                          dtype=self.dtype)(h, train)


class ViTCrossBlock(nn.Module):
    """Pre-norm cross-attention block.

    Reproduces the reference's quirk of normalising query and key/value
    streams with the *same* LayerNorm parameters
    (models/IMGPCEncoder.py:91-95).
    """

    num_heads: int
    mlp_dim: int
    attention_dropout: float
    mlp_dropout: float
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, y, train: bool):
        norm = nn.LayerNorm(epsilon=1e-6, name="attention_norm",
                            dtype=self.dtype)
        xn, yn = norm(x), norm(y)
        x = x + ViTAttention(self.num_heads, self.attention_dropout,
                             dtype=self.dtype)(xn, yn, train)
        h = nn.LayerNorm(epsilon=1e-6, name="ffn_norm", dtype=self.dtype)(x)
        return x + ViTMlp(self.mlp_dim, self.mlp_dropout,
                          dtype=self.dtype)(h, train)
