"""Numeric parity: converted torch weights -> identical flax forward.

The reference checkpoints are stripped, so these tests build small torch
modules with the SAME architecture contracts as the reference's building
blocks (standard Conv/BN/Linear compositions, per docs/PARITY.md), convert
their random weights through the name-map machinery, and assert the flax
forward reproduces the torch forward to float tolerance. This validates the
layout transforms (NCHW->NHWC, conv1d->dense), BatchNorm eval semantics,
padding conventions, LeakyReLU slopes and attention math in one shot.
"""

import numpy as np
import torch
import torch.nn as tnn
import jax
import jax.numpy as jnp

from cmr_agent_tpu.models.layers import (ResidualBlock2D, ResDenseBlock,
                                         MiniPointNet)
from cmr_agent_tpu.models.linear_attention import LinearAttention
from cmr_agent_tpu.train.convert import (apply_name_map, _MapBuilder)


def _to_flax(entries, torch_module, template):
    sd = {k: v.detach().numpy() for k, v in torch_module.state_dict().items()}
    return apply_name_map(entries, sd, template, strict=False)


def test_residual_block2d_matches_torch():
    torch.manual_seed(0)
    cin, cout = 3, 8

    class TBlock(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv_layers = tnn.Sequential(
                tnn.Conv2d(cin, cin, 3, 1, 1), tnn.BatchNorm2d(cin),
                tnn.LeakyReLU(0.2), tnn.Conv2d(cin, cout, 3, 1, 1),
                tnn.BatchNorm2d(cout))
            self.shortcut = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, 1, 0), tnn.BatchNorm2d(cout))

        def forward(self, x):
            return tnn.functional.leaky_relu(
                self.conv_layers(x) + self.shortcut(x), 0.2)

    tb = TBlock().eval()
    # randomise BN running stats so the test exercises them
    for m in tb.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.3)
            m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)

    x = torch.randn(2, cin, 6, 10)
    with torch.no_grad():
        want = tb(x).numpy()

    fb = ResidualBlock2D(cout, 1)
    template = fb.init(jax.random.key(0),
                       jnp.zeros((2, 6, 10, cin)), False)
    b = _MapBuilder()
    b.res_block2d("", "", shortcut=True)
    entries = [(tk.lstrip("."), coll, fp.lstrip("/"), tag)
               for tk, coll, fp, tag in b.entries]
    variables = _to_flax(entries, tb, template)
    got = fb.apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                   False)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-5)


def test_res_dense_block_matches_torch_convbnrelures1d():
    torch.manual_seed(1)
    cin, cout = 6, 4

    class TBlock(tnn.Module):
        def __init__(self):
            super().__init__()
            self.net = tnn.Sequential(
                tnn.Conv1d(cin, cin, 1), tnn.BatchNorm1d(cin),
                tnn.LeakyReLU(0.2), tnn.Conv1d(cin, cout, 1),
                tnn.BatchNorm1d(cout))
            self.shortcut = tnn.Sequential(
                tnn.Conv1d(cin, cout, 1), tnn.BatchNorm1d(cout))

        def forward(self, x):
            return tnn.functional.leaky_relu(
                self.net(x) + self.shortcut(x), 0.2)

    tb = TBlock().eval()
    for m in tb.modules():
        if isinstance(m, tnn.BatchNorm1d):
            m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.3)
            m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)

    x = torch.randn(2, cin, 17)
    with torch.no_grad():
        want = tb(x).numpy()

    fb = ResDenseBlock(cout)
    template = fb.init(jax.random.key(0), jnp.zeros((2, 17, cin)), False)
    b = _MapBuilder()
    b.res_dense("", "", shortcut=True)
    entries = [(tk.lstrip("."), coll, fp.lstrip("/"), tag)
               for tk, coll, fp, tag in b.entries]
    variables = _to_flax(entries, tb, template)
    got = fb.apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 1)),
                   False)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                               rtol=1e-4, atol=1e-5)


def test_mini_pointnet_matches_torch():
    torch.manual_seed(2)
    f = 8

    class TNet(tnn.Module):
        def __init__(self):
            super().__init__()
            for i in (1, 2, 3):
                setattr(self, f"layer_{i}", tnn.Sequential(
                    tnn.Conv1d(3 if i == 1 else f, f, 1),
                    tnn.BatchNorm1d(f), tnn.LeakyReLU(0.2)))

        def forward(self, x):
            return self.layer_3(self.layer_2(self.layer_1(x)))

    tb = TNet().eval()
    x = torch.randn(2, 3, 25)
    with torch.no_grad():
        want = tb(x).numpy()

    fb = MiniPointNet(f)
    template = fb.init(jax.random.key(0), jnp.zeros((2, 25, 3)), False)
    b = _MapBuilder()
    b.mini_pointnet("", "")
    entries = [(tk.lstrip("."), coll, fp.lstrip("/"), tag)
               for tk, coll, fp, tag in b.entries]
    variables = _to_flax(entries, tb, template)
    got = fb.apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 1)),
                   False)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                               rtol=1e-4, atol=1e-5)


def test_linear_attention_matches_torch():
    """Full LoFTR linear-attention block vs a torch transcription of the
    reference formula (LinearAttention.py:38-73)."""
    torch.manual_seed(3)
    d, h = 16, 4

    class TLA(tnn.Module):
        def __init__(self):
            super().__init__()
            self.q_proj = tnn.Linear(d, d, bias=False)
            self.k_proj = tnn.Linear(d, d, bias=False)
            self.v_proj = tnn.Linear(d, d, bias=False)
            self.merge = tnn.Linear(d, d, bias=False)
            self.mlp = tnn.Sequential(
                tnn.Linear(2 * d, 2 * d, bias=False), tnn.ReLU(),
                tnn.Dropout(0.0), tnn.Linear(2 * d, d, bias=False),
                tnn.Dropout(0.0))
            self.norm1 = tnn.LayerNorm(d)
            self.norm2 = tnn.LayerNorm(d)

        def forward(self, x, y):
            bs = x.size(0)
            dim = d // h
            q = self.q_proj(x).view(bs, -1, h, dim)
            k = self.k_proj(y).view(bs, -1, h, dim)
            v = self.v_proj(y).view(bs, -1, h, dim)
            Q = tnn.functional.elu(q) + 1
            K = tnn.functional.elu(k) + 1
            vl = v.size(1)
            v = v / vl
            KV = torch.einsum("nshd,nshv->nhdv", K, v)
            Z = 1 / (torch.einsum("nlhd,nhd->nlh", Q, K.sum(dim=1)) + 1e-6)
            msg = torch.einsum("nlhd,nhdv,nlh->nlhv", Q, KV, Z) * vl
            msg = self.norm1(self.merge(msg.reshape(bs, -1, d)))
            msg = self.norm2(self.mlp(torch.cat([x, msg], dim=2)))
            return x + msg

    tb = TLA().eval()
    x = torch.randn(2, 12, d)
    y = torch.randn(2, 9, d)
    with torch.no_grad():
        want = tb(x, y).numpy()

    fb = LinearAttention(num_heads=h)
    template = fb.init(jax.random.key(0), jnp.zeros((2, 12, d)),
                       jnp.zeros((2, 9, d)), False)
    b = _MapBuilder()
    b.linear_attention("", "")
    entries = [(tk.lstrip("."), coll, fp.lstrip("/"), tag)
               for tk, coll, fp, tag in b.entries]
    variables = _to_flax(entries, tb, template)
    got = fb.apply(variables, jnp.asarray(x.numpy()), jnp.asarray(y.numpy()),
                   False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=1e-5)


def test_vit_cross_block_matches_torch():
    """Pre-norm cross-attention block vs a torch transcription of the
    reference Block (IMGPCEncoder.py:14-102), incl. the shared-LayerNorm
    quirk and eps=1e-6."""
    torch.manual_seed(4)
    d, heads, mlp_dim = 16, 4, 32

    class TAttn(tnn.Module):
        def __init__(self):
            super().__init__()
            self.query = tnn.Linear(d, d)
            self.key = tnn.Linear(d, d)
            self.value = tnn.Linear(d, d)
            self.out = tnn.Linear(d, d)

        def forward(self, xq, ykv):
            hd = d // heads
            def split(t):
                b, n, _ = t.shape
                return t.view(b, n, heads, hd).permute(0, 2, 1, 3)
            q, k, v = split(self.query(xq)), split(self.key(ykv)), \
                split(self.value(ykv))
            att = torch.softmax(q @ k.transpose(-1, -2) / (hd ** 0.5), -1)
            ctx = (att @ v).permute(0, 2, 1, 3).reshape(xq.shape)
            return self.out(ctx)

    class TBlock(tnn.Module):
        def __init__(self):
            super().__init__()
            self.attention_norm = tnn.LayerNorm(d, eps=1e-6)
            self.ffn_norm = tnn.LayerNorm(d, eps=1e-6)
            self.attn = TAttn()
            self.ffn = tnn.Sequential()
            self.ffn.fc1 = tnn.Linear(d, mlp_dim)
            self.ffn.fc2 = tnn.Linear(mlp_dim, d)

        def forward(self, x, y):
            h = x
            xn = self.attention_norm(x)
            yn = self.attention_norm(y)  # shared-norm quirk
            x = h + self.attn(xn, yn)
            h = x
            x = self.ffn.fc2(tnn.functional.gelu(self.ffn.fc1(
                self.ffn_norm(x))))
            return h + x

    tb = TBlock().eval()
    x = torch.randn(2, 7, d)
    y = torch.randn(2, 5, d)
    with torch.no_grad():
        want = tb(x, y).numpy()

    from cmr_agent_tpu.models.layers import ViTCrossBlock
    fb = ViTCrossBlock(num_heads=heads, mlp_dim=mlp_dim,
                       attention_dropout=0.0, mlp_dropout=0.0)
    template = fb.init(jax.random.key(0), jnp.zeros((2, 7, d)),
                       jnp.zeros((2, 5, d)), False)
    b = _MapBuilder()
    b.cross_block("", "")
    entries = [(tk.lstrip("."), coll, fp.lstrip("/"), tag)
               for tk, coll, fp, tag in b.entries]
    # our name map nests attention under ViTAttention_0 / mlp under ViTMlp_0
    variables = _to_flax(entries, tb, template)
    got = fb.apply(variables, jnp.asarray(x.numpy()), jnp.asarray(y.numpy()),
                   False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_group_point_transformer_matches_torch():
    """GroupPointTransformer vs a torch transcription of the reference
    (PointNN.py:126-185) with the torch_scatter group softmax emulated by
    index-wise loops (small N)."""
    torch.manual_seed(5)
    f, n, m, b = 8, 40, 6, 2

    class TGPT(tnn.Module):
        def __init__(self):
            super().__init__()
            self.fc1_0 = tnn.Conv1d(f, f, 1)
            self.fc1_1 = tnn.Conv1d(f, f, 1)
            self.fc2 = tnn.Conv1d(f, f, 1)
            self.fc_delta = tnn.Sequential(tnn.Conv1d(3, f, 1), tnn.ReLU(),
                                           tnn.Conv1d(f, f, 1))
            self.fc_gamma = tnn.Sequential(tnn.Conv1d(f, f, 1), tnn.ReLU(),
                                           tnn.Conv1d(f, f, 1))
            self.w_qs = tnn.Conv1d(f, f, 1, bias=False)
            self.w_ks = tnn.Conv1d(f, f, 1, bias=False)
            self.w_vs = tnn.Conv1d(f, f, 1, bias=False)

        def forward(self, xyz, xf, node, nf, idx):
            pre = nf
            x = self.fc1_0(xf)
            xx = self.fc1_1(nf)
            q = torch.gather(self.w_qs(xx),
                             index=idx.unsqueeze(1).expand(b, f, n), dim=2)
            k, v = self.w_ks(x), self.w_vs(x)
            centers = torch.gather(node,
                                   index=idx.unsqueeze(1).expand(b, 3, n),
                                   dim=2)
            pos = self.fc_delta(xyz - centers)
            attn = self.fc_gamma(q - k + pos) / (f ** 0.5)
            # group softmax via loops
            out = torch.zeros(b, f, m)
            for bb in range(b):
                for g in range(m):
                    rows = (idx[bb] == g).nonzero().flatten()
                    if rows.numel() == 0:
                        continue
                    a = attn[bb][:, rows]
                    a = torch.softmax(a, dim=1)
                    out[bb][:, g] = (a * (v + pos)[bb][:, rows]).sum(1)
            return self.fc2(out) + pre

    tb = TGPT().eval()
    xyz = torch.randn(b, 3, n)
    node = torch.randn(b, 3, m)
    xf = torch.randn(b, f, n)
    nf = torch.randn(b, f, m)
    idx = torch.randint(0, m, (b, n))
    with torch.no_grad():
        want = tb(xyz, xf, node, nf, idx).numpy()

    from cmr_agent_tpu.models.point_encoder import GroupPointTransformer
    fb = GroupPointTransformer(f)
    args = (jnp.asarray(xyz.numpy().transpose(0, 2, 1)),
            jnp.asarray(xf.numpy().transpose(0, 2, 1)),
            jnp.asarray(node.numpy().transpose(0, 2, 1)),
            jnp.asarray(nf.numpy().transpose(0, 2, 1)),
            jnp.asarray(idx.numpy().astype(np.int32)))
    template = fb.init(jax.random.key(0), *args)
    bm = _MapBuilder()
    bm.group_pt("", "")
    entries = [(tk.lstrip("."), coll, fp.lstrip("/"), tag)
               for tk, coll, fp, tag in bm.entries]
    variables = _to_flax(entries, tb, template)
    got = fb.apply(variables, *args)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                               rtol=1e-4, atol=1e-5)


def test_knn_point_transformer_matches_torch():
    """KnnPointTransformer vs a torch transcription of the reference
    (PointNN.py:188-232): dense knn + per-channel softmax vector attention."""
    torch.manual_seed(6)
    f, n, b, kk = 8, 30, 2, 4

    class TKPT(tnn.Module):
        def __init__(self):
            super().__init__()
            self.fc1 = tnn.Linear(f, f)
            self.fc2 = tnn.Linear(f, f)
            self.fc_delta = tnn.Sequential(tnn.Linear(3, f), tnn.ReLU(),
                                           tnn.Linear(f, f))
            self.fc_gamma = tnn.Sequential(tnn.Linear(f, f), tnn.ReLU(),
                                           tnn.Linear(f, f))
            self.w_qs = tnn.Linear(f, f, bias=False)
            self.w_ks = tnn.Linear(f, f, bias=False)
            self.w_vs = tnn.Linear(f, f, bias=False)

        def forward(self, xyz, feat):
            # xyz [b, n, 3], feat [b, n, f]
            d = torch.cdist(xyz, xyz) ** 2
            knn_idx = d.argsort()[:, :, :kk]
            def gather(t):
                return torch.stack([t[i][knn_idx[i]] for i in range(b)])
            knn_xyz = gather(xyz)
            pre = feat
            x = self.fc1(feat)
            q = self.w_qs(x)
            k = gather(self.w_ks(x))
            v = gather(self.w_vs(x))
            pos = self.fc_delta(xyz[:, :, None] - knn_xyz)
            attn = self.fc_gamma(q[:, :, None] - k + pos)
            attn = torch.softmax(attn / (f ** 0.5), dim=-2)
            res = torch.einsum("bmnf,bmnf->bmf", attn, v + pos)
            return self.fc2(res) + pre

    tb = TKPT().eval()
    # distinct pairwise distances so knn tie order can't differ
    xyz = torch.randn(b, n, 3) * 3
    feat = torch.randn(b, n, f)
    with torch.no_grad():
        want = tb(xyz, feat).numpy()

    from cmr_agent_tpu.models.point_encoder import KnnPointTransformer
    fb = KnnPointTransformer(f, k=kk)
    args = (jnp.asarray(xyz.numpy()), jnp.asarray(feat.numpy()))
    template = fb.init(jax.random.key(0), *args)
    bm = _MapBuilder()
    bm.knn_pt("", "")
    entries = [(tk.lstrip("."), coll, fp.lstrip("/"), tag)
               for tk, coll, fp, tag in bm.entries]
    variables = _to_flax(entries, tb, template)
    got = fb.apply(variables, *args)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)
