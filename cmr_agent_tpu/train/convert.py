"""Torch checkpoint -> flax variables converter.

The BASELINE requires loading the reference's trained checkpoints
(``checkpoint/{KITTI,NuScenes}/{geo_feat,agent}.pth``, Test_Agent.py:129-137)
into the TPU models. This module builds an explicit name map between the
reference's torch ``state_dict`` keys (module tree of
models/MultiHeadModel.py / models/CMRAgent.py) and our flax param /
batch_stats paths, with layout transforms:

* Conv2d ``[O,I,kh,kw]`` -> NHWC kernel ``[kh,kw,I,O]``
* Conv3d ``[O,I,1,kh,kw]`` (pose-batched tower) -> ``[kh,kw,I,O]``
* Conv1d ``[O,I,1]`` / Linear ``[O,I]`` -> Dense kernel ``[I,O]``
* BatchNorm weight/bias -> scale/bias; running stats -> batch_stats
* LayerNorm weight/bias -> scale/bias

The converter is total: it raises if any torch key is unconsumed or any
flax leaf unassigned, so drift between the two architectures is caught
immediately.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from ..config import Config

# transform tags
T_DENSE = "dense"      # [O, I] or [O, I, 1] -> [I, O]
T_CONV2D = "conv2d"    # [O, I, kh, kw] -> [kh, kw, I, O]
T_CONV3D = "conv3d"    # [O, I, 1, kh, kw] -> [kh, kw, I, O]
T_COPY = "copy"


def _apply_transform(tag: str, w: np.ndarray) -> np.ndarray:
    if tag == T_DENSE:
        if w.ndim == 3:      # Conv1d k=1
            w = w[:, :, 0]
        return np.ascontiguousarray(w.T)
    if tag == T_CONV2D:
        return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))
    if tag == T_CONV3D:
        return np.ascontiguousarray(np.transpose(w[:, :, 0], (2, 3, 1, 0)))
    return np.asarray(w)


Entry = Tuple[str, str, str, str]  # (torch_key, collection, flax_path, tag)


class _MapBuilder:
    def __init__(self):
        self.entries: List[Entry] = []

    def dense(self, tk: str, fp: str, bias: bool = True):
        self.entries.append((f"{tk}.weight", "params", f"{fp}/kernel", T_DENSE))
        if bias:
            self.entries.append((f"{tk}.bias", "params", f"{fp}/bias", T_COPY))

    def conv2d(self, tk: str, fp: str, bias: bool = True):
        self.entries.append((f"{tk}.weight", "params", f"{fp}/kernel", T_CONV2D))
        if bias:
            self.entries.append((f"{tk}.bias", "params", f"{fp}/bias", T_COPY))

    def conv3d(self, tk: str, fp: str, bias: bool = True):
        self.entries.append((f"{tk}.weight", "params", f"{fp}/kernel", T_CONV3D))
        if bias:
            self.entries.append((f"{tk}.bias", "params", f"{fp}/bias", T_COPY))

    def bn(self, tk: str, fp: str):
        """fp points at our BatchNorm wrapper; inner module is BatchNorm_0."""
        inner = f"{fp}/BatchNorm_0"
        self.entries += [
            (f"{tk}.weight", "params", f"{inner}/scale", T_COPY),
            (f"{tk}.bias", "params", f"{inner}/bias", T_COPY),
            (f"{tk}.running_mean", "batch_stats", f"{inner}/mean", T_COPY),
            (f"{tk}.running_var", "batch_stats", f"{inner}/var", T_COPY),
        ]

    def ln(self, tk: str, fp: str):
        self.entries += [
            (f"{tk}.weight", "params", f"{fp}/scale", T_COPY),
            (f"{tk}.bias", "params", f"{fp}/bias", T_COPY),
        ]

    # ---- composite blocks ----

    def dense_bn(self, tk_conv: str, tk_bn: str, fp: str, idx: int):
        """One Dense+BN pair inside a DenseBNLeaky (our auto-named children)."""
        self.dense(tk_conv, f"{fp}/Dense_0")
        self.bn(tk_bn, f"{fp}/BatchNorm_0")

    def mini_pointnet(self, tk: str, fp: str):
        """torch MiniPointNet layer_{1..3} -> our DenseBNLeaky_{0..2}."""
        for i in range(3):
            sub = f"{fp}/DenseBNLeaky_{i}"
            self.dense(f"{tk}.layer_{i+1}.0", f"{sub}/Dense_0")
            self.bn(f"{tk}.layer_{i+1}.1", f"{sub}/BatchNorm_0")

    def res_dense(self, tk: str, fp: str, shortcut: bool):
        """torch ConvBNReLURes1D -> our ResDenseBlock."""
        self.dense(f"{tk}.net.0", f"{fp}/Dense_0")
        self.bn(f"{tk}.net.1", f"{fp}/BatchNorm_0")
        self.dense(f"{tk}.net.3", f"{fp}/Dense_1")
        self.bn(f"{tk}.net.4", f"{fp}/BatchNorm_1")
        if shortcut:
            self.dense(f"{tk}.shortcut.0", f"{fp}/Dense_2")
            self.bn(f"{tk}.shortcut.1", f"{fp}/BatchNorm_2")

    def res_block2d(self, tk: str, fp: str, shortcut: bool):
        """torch ResidualBlock -> our ResidualBlock2D."""
        self.conv2d(f"{tk}.conv_layers.0", f"{fp}/Conv_0")
        self.bn(f"{tk}.conv_layers.1", f"{fp}/BatchNorm_0")
        self.conv2d(f"{tk}.conv_layers.3", f"{fp}/Conv_1")
        self.bn(f"{tk}.conv_layers.4", f"{fp}/BatchNorm_1")
        if shortcut:
            self.conv2d(f"{tk}.shortcut.0", f"{fp}/Conv_2")
            self.bn(f"{tk}.shortcut.1", f"{fp}/BatchNorm_2")

    def vit_attention(self, tk: str, fp: str):
        for n in ("query", "key", "value", "out"):
            self.dense(f"{tk}.{n}", f"{fp}/{n}")

    def vit_mlp(self, tk: str, fp: str):
        self.dense(f"{tk}.fc1", f"{fp}/Dense_0")
        self.dense(f"{tk}.fc2", f"{fp}/Dense_1")

    def sa_block(self, tk: str, fp: str):
        """torch self-attention Block -> our ViTBlock (auto-named LNs)."""
        self.ln(f"{tk}.attention_norm", f"{fp}/LayerNorm_0")
        self.ln(f"{tk}.ffn_norm", f"{fp}/LayerNorm_1")
        self.vit_attention(f"{tk}.attn", f"{fp}/ViTAttention_0")
        self.vit_mlp(f"{tk}.ffn", f"{fp}/ViTMlp_0")

    def cross_block(self, tk: str, fp: str):
        """torch two-input Block -> our ViTCrossBlock (named LNs)."""
        self.ln(f"{tk}.attention_norm", f"{fp}/attention_norm")
        self.ln(f"{tk}.ffn_norm", f"{fp}/ffn_norm")
        self.vit_attention(f"{tk}.attn", f"{fp}/ViTAttention_0")
        self.vit_mlp(f"{tk}.ffn", f"{fp}/ViTMlp_0")

    def group_pt(self, tk: str, fp: str):
        self.dense(f"{tk}.fc1_0", f"{fp}/fc1_points")
        self.dense(f"{tk}.fc1_1", f"{fp}/fc1_nodes")
        self.dense(f"{tk}.fc2", f"{fp}/fc2")
        self.dense(f"{tk}.fc_delta.0", f"{fp}/fc_delta_0")
        self.dense(f"{tk}.fc_delta.2", f"{fp}/fc_delta_1")
        self.dense(f"{tk}.fc_gamma.0", f"{fp}/fc_gamma_0")
        self.dense(f"{tk}.fc_gamma.2", f"{fp}/fc_gamma_1")
        self.dense(f"{tk}.w_qs", f"{fp}/w_q", bias=False)
        self.dense(f"{tk}.w_ks", f"{fp}/w_k", bias=False)
        self.dense(f"{tk}.w_vs", f"{fp}/w_v", bias=False)

    def knn_pt(self, tk: str, fp: str):
        self.dense(f"{tk}.fc1", f"{fp}/fc1")
        self.dense(f"{tk}.fc2", f"{fp}/fc2")
        self.dense(f"{tk}.fc_delta.0", f"{fp}/fc_delta_0")
        self.dense(f"{tk}.fc_delta.2", f"{fp}/fc_delta_1")
        self.dense(f"{tk}.fc_gamma.0", f"{fp}/fc_gamma_0")
        self.dense(f"{tk}.fc_gamma.2", f"{fp}/fc_gamma_1")
        self.dense(f"{tk}.w_qs", f"{fp}/w_q", bias=False)
        self.dense(f"{tk}.w_ks", f"{fp}/w_k", bias=False)
        self.dense(f"{tk}.w_vs", f"{fp}/w_v", bias=False)

    def linear_attention(self, tk: str, fp: str):
        for n in ("q_proj", "k_proj", "v_proj", "merge"):
            self.dense(f"{tk}.{n}", f"{fp}/{n}", bias=False)
        self.dense(f"{tk}.mlp.0", f"{fp}/mlp_0", bias=False)
        self.dense(f"{tk}.mlp.3", f"{fp}/mlp_1", bias=False)
        self.ln(f"{tk}.norm1", f"{fp}/norm1")
        self.ln(f"{tk}.norm2", f"{fp}/norm2")


def multihead_name_map(cfg: Config) -> List[Entry]:
    """Full key map for MultiHeadModel (geo_feat.pth)."""
    b = _MapBuilder()
    ed, enc = "encoder_decoder", "encoder_decoder/encoder"

    # ---- image transformer ----
    it_t, it_f = "encoder_decoder.encoder.img_transformer", f"{enc}/img_transformer"
    for i in range(6):
        # MiniResNet: shortcut convs exist for block 0 (3->64 channels) and
        # the stride-2 blocks (2 and 4)
        b.res_block2d(f"{it_t}.embeddings.mini_resnet.residual_learning.{i}",
                      f"{it_f}/mini_resnet/ResidualBlock2D_{i}",
                      shortcut=i in (0, 2, 4))
    b.conv2d(f"{it_t}.embeddings.patch_embeddings", f"{it_f}/patch_embed")
    for i in range(cfg.num_sa_layer):
        b.sa_block(f"{it_t}.sa_encoder_layers.{i}", f"{it_f}/sa_{i}")

    # ---- point transformer ----
    pt_t, pt_f = "encoder_decoder.encoder.pt_transformer", f"{enc}/pt_transformer"
    emb = f"{pt_t}.embeddings"
    b.mini_pointnet(f"{emb}.raw_point_mlp", f"{pt_f}/raw_point_mlp")
    b.group_pt(f"{emb}.group_transformer_0", f"{pt_f}/group_0")
    b.mini_pointnet(f"{emb}.point_mlp_0", f"{pt_f}/point_mlp_0")
    b.group_pt(f"{emb}.group_transformer_1", f"{pt_f}/group_1")
    b.mini_pointnet(f"{emb}.point_mlp_1", f"{pt_f}/point_mlp_1")
    b.group_pt(f"{emb}.group_transformer_node", f"{pt_f}/group_node")
    for i in range(3):
        b.knn_pt(f"{emb}.knn_transformers.{i}", f"{pt_f}/knn_{i}")
    b.group_pt(f"{emb}.group_transformer_proxy", f"{pt_f}/group_proxy")
    for i in range(cfg.num_sa_layer):
        b.sa_block(f"{pt_t}.sa_encoder_layers.{i}", f"{pt_f}/sa_{i}")

    # ---- coarse interleave ----
    for i in range(cfg.num_ca_layer_coarse):
        b.cross_block(f"encoder_decoder.encoder.p2i_ca_layers.{i}",
                      f"{enc}/p2i_{i}")
        b.cross_block(f"encoder_decoder.encoder.i2p_ca_layers.{i}",
                      f"{enc}/i2p_{i}")
        b.cross_block(f"encoder_decoder.encoder.img_sa_layers.{i}",
                      f"{enc}/img_sa_{i}")
        b.cross_block(f"encoder_decoder.encoder.pt_sa_layers.{i}",
                      f"{enc}/pt_sa_{i}")

    # ---- fine fusion ----
    for i in range(cfg.node_fuse_res_num):
        b.res_dense(f"encoder_decoder.node_fuse_convs.{i}",
                    f"{ed}/node_fuse_{i}", shortcut=i == 0)
    for i in range(cfg.img_fuse_res_num):
        b.res_block2d(f"encoder_decoder.img_fuse_convs.{i}",
                      f"{ed}/img_fuse_{i}", shortcut=i == 0)
    for i in range(cfg.linear_attention_num):
        b.linear_attention(f"encoder_decoder.pixel_to_node_LA.{i}",
                           f"{ed}/p2n_{i}")
        b.linear_attention(f"encoder_decoder.node_to_pixel_LA.{i}",
                           f"{ed}/n2p_{i}")
        b.linear_attention(f"encoder_decoder.node_self_LA.{i}",
                           f"{ed}/node_self_{i}")
        b.linear_attention(f"encoder_decoder.pixel_self_LA.{i}",
                           f"{ed}/pixel_self_{i}")

    # ---- heads ----
    for head_t, head_f, cdim in (("overlap_head", "overlap_head", 32),
                                 ("geo_head", "geo_head", cfg.embed_dim)):
        for i in range(cfg.pt_head_res_num):
            b.res_dense(f"{head_t}.point_fuse_convs.{i}",
                        f"{head_f}/point_fuse_{i}", shortcut=i == 0)
        pc_name = ("pc_overlap_head" if head_t == "overlap_head"
                   else "pc_geo_head")
        img_name = ("img_overlap_head" if head_t == "overlap_head"
                    else "img_geo_head")
        b.dense(f"{head_t}.{pc_name}.0", f"{head_f}/pc_head_0")
        b.dense(f"{head_t}.{pc_name}.2", f"{head_f}/pc_head_1")
        for i in range(cfg.img_fuse_res_num):
            b.res_block2d(f"{head_t}.img_res_convs.{i}",
                          f"{head_f}/img_res_{i}", shortcut=False)
        b.conv2d(f"{head_t}.{img_name}.0", f"{head_f}/img_head_0")
        b.conv2d(f"{head_t}.{img_name}.2", f"{head_f}/img_head_1")

    return b.entries


def agent_name_map(cfg: Config) -> List[Entry]:
    """Full key map for CMRAgent (agent.pth)."""
    b = _MapBuilder()
    for i in range(4):
        # shortcut projections exist where in != out: (5->f), (2f->f),
        # (2f->f); the last block is (2f->2f) with an identity shortcut
        b.res_dense(f"state_3d_embed.{i}", f"state3d_{i}", shortcut=i != 3)

    conv_map = [(0, "conv0_0"), (3, "conv0_1"), (6, "conv1_0"),
                (9, "conv1_1"), (12, "conv2_0"), (15, "conv2_1"),
                (18, "conv3_0"), (21, "conv3_1"), (24, "conv4_0"),
                (26, "conv4_1")]
    bn_map = [(1, "bn0"), (7, "bn1"), (13, "bn2"), (19, "bn3")]
    for ti, fn in conv_map:
        b.conv2d(f"state_2d_embed.{ti}", fn)
    for ti, fn in bn_map:
        b.bn(f"state_2d_embed.{ti}", fn)

    for head in ("policy_r", "policy_t", "value"):
        b.dense(f"{head}.0", f"{head}_0")
        b.dense(f"{head}.2", f"{head}_1")
        b.dense(f"{head}.4", f"{head}_out")
    return b.entries


def itermodel_name_map(cfg: Config) -> List[Entry]:
    """Key map for IterModel's scoring tower (cost_volume_convs)."""
    b = _MapBuilder()
    conv_map = [(0, "cv_conv0_0"), (3, "cv_conv0_1"), (6, "cv_conv1_0"),
                (9, "cv_conv1_1"), (12, "cv_conv2_0"), (15, "cv_conv2_1"),
                (18, "cv_conv3_0"), (21, "cv_conv3_1"),
                (24, "cv_head_0"), (26, "cv_head_1")]
    bn_map = [(1, "cv_bn0"), (7, "cv_bn1"), (13, "cv_bn2"), (19, "cv_bn3")]
    for ti, fn in conv_map:
        b.conv3d(f"cost_volume_convs.{ti}", fn)
    for ti, fn in bn_map:
        # torch BatchNorm3d maps onto the same per-channel stats
        b.bn(f"cost_volume_convs.{ti}", fn)
    return b.entries


# --------------------------------------------------------------------------
# Application
# --------------------------------------------------------------------------

def _set_path(tree: Dict, path: str, value) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, p))
        else:
            out[p] = v
    return out


def apply_name_map(entries: List[Entry], state_dict: Dict[str, np.ndarray],
                   template: Dict, skip_torch: Tuple[str, ...] = (),
                   strict: bool = True) -> Dict:
    """Build flax variables from a torch ``state_dict`` using ``entries``.

    ``template`` is the flax variables dict (from ``model.init``) used for
    structure and shape checking. Raises on unconsumed torch keys (modulo
    ``skip_torch`` prefixes), missing template leaves, or shape mismatch.
    """
    flat_template = {c: _flatten(template.get(c, {}))
                     for c in ("params", "batch_stats")}
    out: Dict[str, Dict] = {"params": {}, "batch_stats": {}}
    consumed = set()

    for tk, coll, fp, tag in entries:
        if tk not in state_dict:
            raise KeyError(f"torch key missing from checkpoint: {tk}")
        w = _apply_transform(tag, np.asarray(state_dict[tk]))
        if fp not in flat_template[coll]:
            raise KeyError(f"flax path not in template: {coll}:{fp}")
        want = flat_template[coll][fp].shape
        if tuple(w.shape) != tuple(want):
            raise ValueError(
                f"shape mismatch {tk} -> {fp}: {w.shape} vs {want}")
        _set_path(out[coll], fp, w.astype(np.float32))
        consumed.add(tk)

    if strict:
        skipped = [k for k in state_dict
                   if k not in consumed
                   and not any(k.startswith(p) for p in skip_torch)
                   and not k.endswith("num_batches_tracked")
                   and "position_embeddings" not in k]
        if skipped:
            raise KeyError(f"unconsumed torch keys: {skipped[:8]}"
                           f" (+{max(0, len(skipped)-8)} more)")
        for coll in ("params", "batch_stats"):
            missing = set(flat_template[coll]) - set(_flatten(out[coll]))
            if missing:
                raise KeyError(
                    f"unassigned flax leaves in {coll}: "
                    f"{sorted(missing)[:8]} (+{max(0, len(missing)-8)})")
    return out


def _load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}


def convert_torch_multihead(cfg: Config, state_dict_or_path,
                            template: Dict) -> Dict:
    """Convert ``geo_feat.pth`` (path or loaded dict) to flax variables.

    The reference's image ``Embeddings`` registers its MiniResNet and
    patchify conv TWICE — as ``mini_resnet``/``patch_embeddings`` and again
    inside the ``embedding_layers`` ModuleList (ImageViT.py:15-23) — so real
    checkpoints carry exact-duplicate alias keys; the aliases are skipped.
    """
    sd = (_load_torch_state_dict(state_dict_or_path)
          if isinstance(state_dict_or_path, str) else state_dict_or_path)
    alias = "encoder_decoder.encoder.img_transformer.embeddings.embedding_layers."
    return apply_name_map(multihead_name_map(cfg), sd, template,
                          skip_torch=(alias,))


def convert_torch_agent(cfg: Config, state_dict_or_path,
                        template: Dict) -> Dict:
    """Convert ``agent.pth`` to flax variables."""
    sd = (_load_torch_state_dict(state_dict_or_path)
          if isinstance(state_dict_or_path, str) else state_dict_or_path)
    return apply_name_map(agent_name_map(cfg), sd, template)


def convert_torch_itermodel(cfg: Config, state_dict_or_path,
                            template: Dict) -> Dict:
    """Convert an IterModel checkpoint to flax variables."""
    sd = (_load_torch_state_dict(state_dict_or_path)
          if isinstance(state_dict_or_path, str) else state_dict_or_path)
    return apply_name_map(itermodel_name_map(cfg), sd, template)
