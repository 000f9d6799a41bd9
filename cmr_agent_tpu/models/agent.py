"""CMRAgent: the actor-critic refinement policy.

Capability of reference models/CMRAgent.py:17-144. The 3-D state branch is
a 4-stage pointwise-residual PointNet with global-max re-broadcast between
stages; the 2-D branch is a 5-stage conv/avg-pool CNN; both collapse to
128-d embeddings, concatenated into the 256-d state from which three MLPs
predict rotation logits, translation logits and the state value.

Layouts: state_2d is NHWC ``[B, H, W, 2F]``; state_3d is ``[B, N, 5]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import Config
from typing import Any

from .layers import (ResDenseBlock, BatchNorm, leaky, torch_kernel_init,
                     _BNParams, _DenseParams, fold_dense_bn,
                     fused_stack_mode)


def _avg_pool(x, window):
    return nn.avg_pool(x, window, strides=window, padding="VALID")


class _SplitInputDense(nn.Module):
    """Dense over a virtual ``concat([feat, pooled_broadcast])`` input.

    The reference's 3-D state stack concatenates a max-pooled global vector
    (broadcast over all 40960 points) onto the per-point features before
    each layer (CMRAgent.py:96-99). Materialising that broadcast+concat is
    pure HBM traffic — the stack measures at the bandwidth roofline — so
    this layer keeps the SAME parameter (one kernel over the concatenated
    width, converter-compatible) but computes

        feat @ kernel[:F] + pooled @ kernel[F:] + bias

    where the second term is a [B, 1, out] broadcast-add.
    """

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, feat, pooled):
        f_in = feat.shape[-1] + pooled.shape[-1]
        kernel = self.param("kernel", torch_kernel_init,
                            (f_in, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        dt = self.dtype or feat.dtype
        k = kernel.astype(dt)
        per_point = feat.astype(dt) @ k[: feat.shape[-1]]
        global_part = pooled.astype(dt) @ k[feat.shape[-1]:]
        return per_point + global_part + bias.astype(dt)


class _ResDenseSplitBlock(nn.Module):
    """ResDenseBlock whose input is the virtual concat (feat, pooled).

    Identical math and parameter tree to
    :class:`cmr_agent_tpu.models.layers.ResDenseBlock` applied to
    ``concat([feat, broadcast(pooled)])`` (Dense_0/BatchNorm_0/Dense_1/
    BatchNorm_1 + Dense_2/BatchNorm_2 shortcut), without materialising the
    concat.
    """

    features: int
    dtype: Any = None
    use_pallas: Any = None
    cn: bool = False  # channel-major [B, C, N] / pooled [B, C, 1]

    @nn.compact
    def __call__(self, feat, pooled, train: bool):
        mode = fused_stack_mode(self.use_pallas, train, scope="agent")
        if self.cn:
            assert mode is not None, \
                "cn layout is only valid on the fused eval path"
            f_in, p = feat.shape[1], pooled.shape[1]
        else:
            f_in, p = feat.shape[-1], pooled.shape[-1]
        in_features = f_in + p
        if mode is None:
            h = _SplitInputDense(in_features, dtype=self.dtype,
                                 name="Dense_0")(feat, pooled)
            h = BatchNorm(name="BatchNorm_0")(h, train)
            h = leaky(h)
            h = nn.Dense(self.features, kernel_init=torch_kernel_init,
                         dtype=self.dtype, name="Dense_1")(h)
            h = BatchNorm(name="BatchNorm_1")(h, train)
            s = _SplitInputDense(self.features, dtype=self.dtype,
                                 name="Dense_2")(feat, pooled)
            s = BatchNorm(name="BatchNorm_2")(s, train)
            return leaky(h + s)

        # Fused eval: BN folds into the matmuls and the pooled-broadcast
        # contribution of each split kernel folds into a per-batch bias,
        # so the whole block is one VMEM round trip of the stack tensor
        # (layers.py fused-eval-stacks note). Identical parameter tree.
        from ..ops.pallas_kernels import (fused_dense_chain,
                                          fused_dense_chain_cn)
        if self.dtype is not None:
            feat = feat.astype(self.dtype)
        pooled32 = (pooled[:, :, 0] if self.cn
                    else pooled[:, 0, :]).astype(jnp.float32)  # [B, P]
        k0, c0 = _DenseParams(in_features, name="Dense_0")(in_features)
        w0, b0 = fold_dense_bn(k0, c0,
                               *_BNParams(name="BatchNorm_0")(in_features))
        k1, c1 = _DenseParams(self.features, name="Dense_1")(in_features)
        w1, b1 = fold_dense_bn(k1, c1,
                               *_BNParams(name="BatchNorm_1")(self.features))
        k2, c2 = _DenseParams(self.features, name="Dense_2")(in_features)
        w2, b2 = fold_dense_bn(k2, c2,
                               *_BNParams(name="BatchNorm_2")(self.features))
        bias0 = pooled32 @ w0[f_in:] + b0                    # [B, C]
        bias2 = pooled32 @ w2[f_in:] + b2
        chain = fused_dense_chain_cn if self.cn else fused_dense_chain
        return chain(feat, (w0[:f_in], w1), (bias0, b1),
                     w2[:f_in], bias2, slopes=(0.2, None),
                     residual="proj", final_slope=0.2,
                     interpret=(mode == "interpret"))


class _ResDenseConcatBlock(nn.Module):
    """ResDenseBlock over the virtual ``concat([feat, broadcast(pooled)])``.

    Parameter tree identical to
    :class:`cmr_agent_tpu.models.layers.ResDenseBlock` with an identity
    shortcut (Dense_0/BatchNorm_0/Dense_1/BatchNorm_1) applied to the
    materialised concat — which is exactly what the unfused branch does.
    The fused eval branch never materialises the concat: Dense_0's pooled
    half folds into a per-batch bias and the identity shortcut's pooled
    half is broadcast in VMEM (fused_dense_chain residual
    "identity_split").
    """

    features: int
    dtype: Any = None
    use_pallas: Any = None
    cn: bool = False  # channel-major [B, C, N] / pooled [B, C, 1]

    @nn.compact
    def __call__(self, feat, pooled, train: bool):
        mode = fused_stack_mode(self.use_pallas, train, scope="agent")
        if self.cn:
            assert mode is not None, \
                "cn layout is only valid on the fused eval path"
            f_in, p = feat.shape[1], pooled.shape[1]
        else:
            f_in, p = feat.shape[-1], pooled.shape[-1]
        in_features = f_in + p
        assert in_features == self.features, "identity shortcut shape"
        if mode is None:
            x = jnp.concatenate(
                [feat, jnp.broadcast_to(pooled, feat.shape[:-1]
                                        + (pooled.shape[-1],))], axis=-1)
            dense = lambda fts, name: nn.Dense(
                fts, kernel_init=torch_kernel_init, dtype=self.dtype,
                name=name)
            h = dense(in_features, "Dense_0")(x)
            h = BatchNorm(name="BatchNorm_0")(h, train)
            h = leaky(h)
            h = dense(self.features, "Dense_1")(h)
            h = BatchNorm(name="BatchNorm_1")(h, train)
            return leaky(h + x)

        from ..ops.pallas_kernels import (fused_dense_chain,
                                          fused_dense_chain_cn)
        if self.dtype is not None:
            feat = feat.astype(self.dtype)
        pooled32 = (pooled[:, :, 0] if self.cn
                    else pooled[:, 0, :]).astype(jnp.float32)  # [B, P]
        k0, c0 = _DenseParams(in_features, name="Dense_0")(in_features)
        w0, b0 = fold_dense_bn(k0, c0,
                               *_BNParams(name="BatchNorm_0")(in_features))
        k1, c1 = _DenseParams(self.features, name="Dense_1")(in_features)
        w1, b1 = fold_dense_bn(k1, c1,
                               *_BNParams(name="BatchNorm_1")(self.features))
        bias0 = pooled32 @ w0[f_in:] + b0
        chain = fused_dense_chain_cn if self.cn else fused_dense_chain
        return chain(feat, (w0[:f_in], w1), (bias0, b1),
                     pooled=pooled32, slopes=(0.2, None),
                     residual="identity_split", final_slope=0.2,
                     interpret=(mode == "interpret"))


class CMRAgent(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, state_2d, state_3d, train: bool = False):
        cfg = self.cfg
        f = cfg.embed_dim
        dt = cfg.jnp_dtype()
        state_2d = state_2d.astype(dt)
        state_3d = state_3d.astype(dt)

        # <-- 3-D branch: ConvBNReLURes1D stack with max-pool re-broadcast
        #     (CMRAgent.py:25-29, 92-101). The broadcast+concat between
        #     stages is never materialised for the projected-shortcut
        #     layers (see _ResDenseSplitBlock) — the stack runs at the HBM
        #     roofline, so this is a direct traffic cut. The observation
        #     may arrive CHANNEL-MAJOR ([B, C, N], detected by the channel
        #     count): XLA pads the minormost dim to 128 lanes, so the
        #     row-major [B, N, 5..128] stack tensors cost up to 25x their
        #     logical bytes; the cn layout streams at the true roofline
        #     (fused eval only — training keeps the reference layout). -->
        up = cfg.use_pallas
        from .layers import fused_stack_mode
        cn = state_3d.shape[-1] not in (5, 7)                # [B, C, N]?
        if cn and fused_stack_mode(up, train, scope="agent") is None:
            state_3d = jnp.swapaxes(state_3d, 1, 2)          # CPU fallback
            cn = False
        pool_axis = 2 if cn else 1
        feat = ResDenseBlock(f, dtype=dt, use_pallas=up, cn=cn, fuse_scope="agent",
                             name="state3d_0")(state_3d, train)
        pooled = jnp.max(feat, axis=pool_axis, keepdims=True)
        feat = _ResDenseSplitBlock(f, dtype=dt, use_pallas=up, cn=cn,
                                   name="state3d_1")(feat, pooled, train)
        pooled = jnp.max(feat, axis=pool_axis, keepdims=True)
        feat = _ResDenseSplitBlock(f, dtype=dt, use_pallas=up, cn=cn,
                                   name="state3d_2")(feat, pooled, train)
        pooled = jnp.max(feat, axis=pool_axis, keepdims=True)
        # last stage: identity shortcut over the virtual (feat, pooled)
        # concat — never materialised on the fused eval path
        feat = _ResDenseConcatBlock(2 * f, dtype=dt, use_pallas=up, cn=cn,
                                    name="state3d_3")(feat, pooled, train)
        embed_3d = jnp.max(feat, axis=pool_axis)                 # [B, 2f]

        # <-- 2-D branch: conv/avg-pool pyramid (CMRAgent.py:31-60) -->
        # Default-slope (0.01) LeakyReLU, matching torch nn.LeakyReLU().
        lrelu = lambda x: nn.leaky_relu(x, negative_slope=0.01)
        conv = lambda d, name: nn.Conv(d, (3, 3), padding=1,
                                       kernel_init=torch_kernel_init,
                                       dtype=dt, name=name)
        x = state_2d
        for s in range(3):
            x = conv(2 * f, f"conv{s}_0")(x)
            x = BatchNorm(name=f"bn{s}")(x, train)
            x = lrelu(x)
            x = conv(2 * f, f"conv{s}_1")(x)
            x = lrelu(x)
            x = _avg_pool(x, (2, 2))
        x = conv(2 * f, "conv3_0")(x)
        x = BatchNorm(name="bn3")(x, train)
        x = lrelu(x)
        x = conv(2 * f, "conv3_1")(x)
        x = lrelu(x)
        x = jnp.mean(x, axis=(1, 2), keepdims=True)              # AvgPool(H/8,W/8)
        x = nn.Conv(2 * f, (1, 1), kernel_init=torch_kernel_init, dtype=dt,
                    name="conv4_0")(x)
        x = lrelu(x)
        x = nn.Conv(2 * f, (1, 1), kernel_init=torch_kernel_init, dtype=dt,
                    name="conv4_1")(x)
        embed_2d = x.reshape(x.shape[0], -1)                     # [B, 2f]

        state = jnp.concatenate([embed_2d, embed_3d], axis=-1)   # [B, 4f]
        if cfg.policy_aux_state:
            # the bearing channels (state_3d[..., 5:]) are constant per
            # sample, so any point's row carries the full statistic; feed
            # it straight to the heads instead of through the max-pool
            # stack (Config.policy_aux_state)
            n_ch = state_3d.shape[1] if cn else state_3d.shape[-1]
            if n_ch != 7:
                raise ValueError(
                    "policy_aux_state requires the bearing observation "
                    "channels (obs_bearing_channels=True -> state_3d "
                    f"[B,N,7]); got {n_ch} channels")
            aux = state_3d[:, 5:, 0] if cn else state_3d[:, 0, 5:]
            state = jnp.concatenate([state, aux], axis=-1)

        def mlp_head(widths, out_dim, name):
            h = state
            for i, wdt in enumerate(widths):
                h = nn.Dense(wdt, kernel_init=torch_kernel_init, dtype=dt,
                             name=f"{name}_{i}")(h)
                h = lrelu(h)
            out = nn.Dense(out_dim, kernel_init=torch_kernel_init, dtype=dt,
                           name=f"{name}_out")(h)
            return out.astype(jnp.float32)  # logits/value leave in f32

        r_logits = mlp_head([4 * f, 4 * f], cfg.degree_r * cfg.num_steps,
                            "policy_r")
        t_logits = mlp_head([4 * f, 4 * f], cfg.degree_t * cfg.num_steps,
                            "policy_t")
        value = mlp_head([f, f], 1, "value")

        b = state.shape[0]
        r_logits = r_logits.reshape(b, cfg.degree_r, cfg.num_steps)
        t_logits = t_logits.reshape(b, cfg.degree_t, cfg.num_steps)
        return r_logits, t_logits, value[:, :, None]             # [B,1,1]


def action_from_logits(r_logits, t_logits, key=None, deterministic=False):
    """Sample (or argmax) discrete actions (CMRAgent.py:117-127)."""
    if deterministic:
        return jnp.argmax(r_logits, axis=-1), jnp.argmax(t_logits, axis=-1)
    kr, kt = jax.random.split(key)
    action_r = jax.random.categorical(kr, r_logits, axis=-1)
    action_t = jax.random.categorical(kt, t_logits, axis=-1)
    return action_r, action_t


def action_logprob_and_entropy(r_logits, t_logits, action_r, action_t):
    """Log-prob + entropy of chosen actions (CMRAgent.py:129-144).

    Returns ``(logprob [B, dr+dt], entropy [B, dr+dt])``.
    """
    def lp_ent(logits, action):
        logp = jax.nn.log_softmax(logits, axis=-1)
        picked = jnp.take_along_axis(logp, action[..., None], axis=-1)[..., 0]
        ent = -jnp.sum(jnp.exp(logp) * logp, axis=-1)
        return picked, ent

    lp_r, ent_r = lp_ent(r_logits, action_r)
    lp_t, ent_t = lp_ent(t_logits, action_t)
    return (jnp.concatenate([lp_r, lp_t], axis=-1),
            jnp.concatenate([ent_r, ent_t], axis=-1))
