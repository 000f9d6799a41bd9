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


# <------------- fused eval stacks (Pallas dense chains) ------------->
#
# The pointwise stacks below are memory-bound: XLA fuses BN + activation
# into each matmul but still round-trips the [B, N, C] tensor through HBM
# once per layer (measured at the ~920 GB/s roofline on the 40960-point
# stacks). At eval, BatchNorm folds into the preceding matmul, so the
# whole stack collapses into ops/pallas_kernels.fused_dense_chain — one
# HBM read and one write. The parameter-holder modules below declare the
# EXACT SAME parameter tree as the unfused branch (Dense_i / BatchNorm_i
# wrapping an inner nn.BatchNorm named BatchNorm_0), so checkpoints,
# converters and the training path are untouched; only the eval compute
# routing differs. Training keeps the standard modules (batch statistics).

class _BNInnerParams(nn.Module):
    """Twin of ``nn.BatchNorm``'s parameter/variable tree (no compute)."""

    @nn.compact
    def __call__(self, features: int):
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((features,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((features,), jnp.float32))
        return scale, bias, mean.value, var.value


class _BNParams(nn.Module):
    """Twin of :class:`BatchNorm` (wrapper containing ``BatchNorm_0``)."""

    @nn.compact
    def __call__(self, features: int):
        return _BNInnerParams(name="BatchNorm_0")(features)


class _DenseParams(nn.Module):
    """Twin of ``nn.Dense``'s parameter tree (no compute)."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", torch_kernel_init,
                       (in_features, self.features))
        b = (self.param("bias", nn.initializers.zeros, (self.features,))
             if self.use_bias else None)
        return k, b


class _DenseBNLeakyParams(nn.Module):
    """Twin of :class:`DenseBNLeaky`, returning the BN-folded (W, b)."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        k, c = _DenseParams(self.features, name="Dense_0")(in_features)
        scale, bias, mean, var = _BNParams(name="BatchNorm_0")(self.features)
        return fold_dense_bn(k, c, scale, bias, mean, var)


def fold_dense_bn(kernel, bias, scale, bn_bias, mean, var,
                  eps: float = 1e-5):
    """Fold eval-mode BatchNorm into the preceding Dense (f32).

    ``BN(xW + b) = x(W*s) + ((b - mean)*s + beta)`` with
    ``s = scale / sqrt(var + eps)``.
    """
    s = scale / jnp.sqrt(var + eps)
    return kernel * s[None, :], (bias - mean) * s + bn_bias


def fused_stack_mode(use_pallas, train: bool, scope: str = "geo"):
    """Route a pointwise stack to the fused eval kernel?

    Returns ``None`` (unfused — the default), ``"compiled"`` (TPU eval
    with ``CMR_FUSED_STACKS=1``) or ``"interpret"`` (CPU tests force the
    fused branch via ``CMR_FUSED_STACK_INTERPRET=1``).

    ``CMR_FUSED_STACKS=agent`` fuses only ``scope="agent"`` stacks (the
    episode-scan CMRAgent branches) while the geo encoder keeps the plain
    XLA stacks — probing whether the round-3 global loss was purely on
    the geo side. Measured (round 4, bench.py B=8 bf16, same session):
    agent-only fusion 154.3 pairs/s vs 159.0 unfused — ALSO a reject;
    the in-scan chains lose the same way the geo chains do.

    Default OFF (measured reject, round 3): end-to-end the fused chains +
    channel-major episode measured 149.2 pairs/s vs 157.4 for the plain
    XLA eval stacks under identical same-day conditions (bench.py, B=8
    bf16, median of 5 blocks each) — the Pallas calls are fusion barriers
    that cost more than the saved inter-layer HBM round trips at these
    shapes. The kernels stay as an opt-in study surface; the routing
    remains gated on ``use_pallas`` so non-TPU backends never take it.
    """
    if train:
        return None
    import os
    from ..ops.pallas_kernels import use_pallas_default
    on_tpu = use_pallas_default(use_pallas)
    if os.environ.get("CMR_FUSED_STACK_INTERPRET") == "1" and not on_tpu:
        # Test-only hook: exercises the fused branch under the Pallas
        # interpreter on CPU. Ignored on TPU so a stray env var in a
        # serving config can never silently force slow interpret-mode
        # kernels there; use CMR_FUSED_STACKS=1 for the compiled path.
        return "interpret"
    gate = os.environ.get("CMR_FUSED_STACKS")
    if gate != "1" and not (gate == "agent" and scope == "agent"):
        return None
    return "compiled" if on_tpu else None


class MiniPointNet(nn.Module):
    """3 x (Dense-BN-LeakyReLU(0.2)) shared point MLP (PointNN.py:96-123).

    Eval on TPU runs the whole stack as one fused dense chain (see the
    fused-eval-stacks note above); training and other backends keep the
    layer-by-layer modules. Identical parameter tree either way.
    """

    features: int
    dtype: Dtype = None
    use_pallas: Any = None
    fuse_scope: str = "geo"  # fused_stack_mode routing scope

    @nn.compact
    def __call__(self, x, train: bool):
        mode = fused_stack_mode(self.use_pallas, train, scope=self.fuse_scope)
        if mode is None:
            for _ in range(3):
                x = DenseBNLeaky(self.features, dtype=self.dtype)(x, train)
            return x
        from ..ops.pallas_kernels import fused_dense_chain
        if self.dtype is not None:
            x = x.astype(self.dtype)
        ws, bs = [], []
        cin = x.shape[-1]
        for i in range(3):
            w, b = _DenseBNLeakyParams(self.features,
                                       name=f"DenseBNLeaky_{i}")(cin)
            ws.append(w)
            bs.append(b)
            cin = self.features
        return fused_dense_chain(x, tuple(ws), tuple(bs),
                                 slopes=(0.2, 0.2, 0.2),
                                 interpret=(mode == "interpret"))


class ResDenseBlock(nn.Module):
    """Residual pointwise block — the reference's ConvBNReLURes1D
    (PointNN.py:260-282): Dense-BN-LReLU-Dense-BN (+ projected shortcut),
    final LReLU after the sum. Eval on TPU runs as one fused dense chain
    (see the fused-eval-stacks note above); same parameter tree.
    """

    features: int
    dtype: Dtype = None
    use_pallas: Any = None
    cn: bool = False  # channel-major input [B, C, N] (fused eval only)
    fuse_scope: str = "geo"  # fused_stack_mode routing scope

    @nn.compact
    def __call__(self, x, train: bool):
        mode = fused_stack_mode(self.use_pallas, train, scope=self.fuse_scope)
        if self.cn:
            assert mode is not None, \
                "cn layout is only valid on the fused eval path"
        in_features = x.shape[1] if self.cn else x.shape[-1]
        if mode is None:
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

        from ..ops.pallas_kernels import (fused_dense_chain,
                                          fused_dense_chain_cn)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        k0, c0 = _DenseParams(in_features, name="Dense_0")(in_features)
        w0, b0 = fold_dense_bn(k0, c0,
                               *_BNParams(name="BatchNorm_0")(in_features))
        k1, c1 = _DenseParams(self.features, name="Dense_1")(in_features)
        w1, b1 = fold_dense_bn(k1, c1,
                               *_BNParams(name="BatchNorm_1")(self.features))
        if in_features == self.features:
            residual, rw, rb = "identity", None, None
        else:
            k2, c2 = _DenseParams(self.features, name="Dense_2")(in_features)
            rw, rb = fold_dense_bn(
                k2, c2, *_BNParams(name="BatchNorm_2")(self.features))
            residual = "proj"
        chain = fused_dense_chain_cn if self.cn else fused_dense_chain
        return chain(x, (w0, w1), (b0, b1), rw, rb,
                     slopes=(0.2, None), residual=residual,
                     final_slope=0.2, interpret=(mode == "interpret"))


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
