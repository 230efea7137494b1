"""Checkpointing: orbax save/restore + torch checkpoint conversion.

Native format: orbax-checkpoint over the TrainState pytree (params,
batch_stats, opt_state, step) — the TPU-equivalent of the reference's
``torch.save({'net', 'optimizer', 'schedule', 'last_epoch'})``
(train.py:137-149).

Torch import: maps the reference DIR state_dict (and torchvision
ResNet-50 ImageNet weights) onto our flax parameter tree so the released
``DIR.pth`` can seed benchmark-parity evaluation (apps/eval.py:107-108
loads with strict=False; unmatched reference keys — MANO buffers, the
never-executed STE block 0 — are intentionally dropped).
"""

from __future__ import annotations

import os
import re
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# orbax native checkpoints
# ---------------------------------------------------------------------------

def save_checkpoint(ckpt_dir: str, state, step: int, name: str = "latest"):
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(ckpt_dir: str, target, name: str = "latest"):
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target)


# ---------------------------------------------------------------------------
# torch -> flax conversion
# ---------------------------------------------------------------------------

def _conv2d(w: np.ndarray) -> np.ndarray:
    """torch Conv2d (O, I, kH, kW) -> flax (kH, kW, I, O)."""
    return np.transpose(w, (2, 3, 1, 0))


def _conv1d_dense(w: np.ndarray) -> np.ndarray:
    """torch Conv1d (O, I, 1) -> flax Dense kernel (I, O)."""
    return np.transpose(w[:, :, 0], (1, 0))


def _linear(w: np.ndarray) -> np.ndarray:
    """torch Linear (O, I) -> flax Dense kernel (I, O)."""
    return np.transpose(w, (1, 0))


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = jnp.asarray(value)


class _Mapper:
    """Collects params/batch_stats assignments from torch tensors."""

    def __init__(self, sd: Dict[str, np.ndarray]):
        self.sd = {k: np.asarray(v) for k, v in sd.items()}
        self.params: dict = {}
        self.stats: dict = {}
        self.used: set = set()

    def t(self, key: str) -> np.ndarray:
        self.used.add(key)
        return self.sd[key]

    def has(self, key: str) -> bool:
        return key in self.sd

    def conv(self, tkey: str, path: Tuple[str, ...], bias: bool = True):
        _set(self.params, path + ("kernel",), _conv2d(self.t(tkey + ".weight")))
        if bias and self.has(tkey + ".bias"):
            _set(self.params, path + ("bias",), self.t(tkey + ".bias"))

    def dense_from_conv1d(self, tkey: str, path: Tuple[str, ...]):
        _set(self.params, path + ("kernel",),
             _conv1d_dense(self.t(tkey + ".weight")))
        _set(self.params, path + ("bias",), self.t(tkey + ".bias"))

    def dense(self, tkey: str, path: Tuple[str, ...]):
        _set(self.params, path + ("kernel",), _linear(self.t(tkey + ".weight")))
        if self.has(tkey + ".bias"):
            _set(self.params, path + ("bias",), self.t(tkey + ".bias"))

    def bn(self, tkey: str, path: Tuple[str, ...]):
        _set(self.params, path + ("scale",), self.t(tkey + ".weight"))
        _set(self.params, path + ("bias",), self.t(tkey + ".bias"))
        _set(self.stats, path + ("mean",), self.t(tkey + ".running_mean"))
        _set(self.stats, path + ("var",), self.t(tkey + ".running_var"))

    def ln(self, tkey: str, path: Tuple[str, ...]):
        _set(self.params, path + ("scale",), self.t(tkey + ".weight"))
        _set(self.params, path + ("bias",), self.t(tkey + ".bias"))


def _map_residual(m: _Mapper, tpre: str, fpre: Tuple[str, ...]):
    """Hourglass Residual (models/backbone/hourglass.py:33-70)."""
    m.bn(f"{tpre}.bn1", fpre + ("bn1",))
    m.conv(f"{tpre}.conv1.conv", fpre + ("conv1",))
    m.bn(f"{tpre}.bn2", fpre + ("bn2",))
    m.conv(f"{tpre}.conv2.conv", fpre + ("conv2",))
    m.bn(f"{tpre}.bn3", fpre + ("bn3",))
    m.conv(f"{tpre}.conv3.conv", fpre + ("conv3",))
    if m.has(f"{tpre}.skip_layer.conv.weight"):
        # torch always constructs skip_layer; flax only has it when
        # channel counts differ. Map when our tree expects it (decided by
        # the caller keeping or pruning afterwards is avoided: the skip
        # conv exists in our model iff in_dim != out_dim, and the torch
        # weights are identity-unused otherwise — map unconditionally and
        # prune later).
        m.conv(f"{tpre}.skip_layer.conv", fpre + ("skip",))


def _map_mlp1d(m: _Mapper, tpre: str, fpre: Tuple[str, ...]):
    """Sequential(Conv1d, BN1d, ReLU, Conv1d) -> MLP1d."""
    m.dense_from_conv1d(f"{tpre}.0", fpre + ("fc1",))
    m.bn(f"{tpre}.1", fpre + ("bn",))
    m.dense_from_conv1d(f"{tpre}.3", fpre + ("fc2",))


def _map_bottleneck(m: _Mapper, tpre: str, fpre: Tuple[str, ...]):
    for i in (1, 2, 3):
        m.conv(f"{tpre}.conv{i}", fpre + (f"conv{i}",), bias=False)
        m.bn(f"{tpre}.bn{i}", fpre + (f"bn{i}",))
    if m.has(f"{tpre}.downsample.0.weight"):
        m.conv(f"{tpre}.downsample.0", fpre + ("down_conv",), bias=False)
        m.bn(f"{tpre}.downsample.1", fpre + ("down_bn",))


def _map_resnet(m: _Mapper, tpre: str, fpre: Tuple[str, ...],
                layers=(3, 4, 6, 3)):
    m.conv(f"{tpre}.conv1", fpre + ("conv1",), bias=False)
    m.bn(f"{tpre}.bn1", fpre + ("bn1",))
    for s, blocks in enumerate(layers):
        for b in range(blocks):
            _map_bottleneck(m, f"{tpre}.layer{s + 1}.{b}",
                            fpre + (f"layer{s + 1}_{b}",))


def _map_gcn(m: _Mapper, tpre: str, fpre: Tuple[str, ...], num_layers=4):
    """ResSimplePGCN (SemGCN/p_gcn.py:63-73)."""
    for i in range(num_layers):
        g = f"{tpre}.gconv_layers.{i}"
        f = fpre + (f"layer{i}",)
        _set(m.params, f + ("gconv", "w"), m.t(f"{g}.gconv.W"))
        _set(m.params, f + ("gconv", "e0"), m.t(f"{g}.gconv.e_0")[0])
        _set(m.params, f + ("gconv", "e1"), m.t(f"{g}.gconv.e_1")[0])
        _set(m.params, f + ("gconv", "bias"), m.t(f"{g}.gconv.bias"))
        m.bn(f"{g}.bn", f + ("bn",))


def _map_ste(m: _Mapper, tpre: str, fpre: Tuple[str, ...], depth=4):
    """STE transformer; torch block 0 is constructed-but-unused
    (mixSTE.py:197) and deliberately dropped."""
    _set(m.params, fpre + ("spatial_pos_embed",),
         m.t(f"{tpre}.spatial_pos_embed"))
    for i in range(1, depth):
        b = f"{tpre}.STEblocks.{i}"
        f = fpre + (f"block{i}",)
        m.ln(f"{b}.norm1", f + ("norm1",))
        m.dense(f"{b}.attn.qkv", f + ("attn", "qkv"))
        m.dense(f"{b}.attn.proj", f + ("attn", "proj"))
        m.ln(f"{b}.norm2", f + ("norm2",))
        m.dense(f"{b}.mlp.fc1", f + ("mlp", "fc1"))
        m.dense(f"{b}.mlp.fc2", f + ("mlp", "fc2"))
    m.ln(f"{tpre}.spatial_norm", fpre + ("spatial_norm",))
    m.ln(f"{tpre}.head.0", fpre + ("head_norm",))
    m.dense(f"{tpre}.head.1", fpre + ("head",))


def _map_seg_dense_head(m: _Mapper, tpre: str, fpre: Tuple[str, ...]):
    m.conv(f"{tpre}.0", fpre + ("conv1",))
    m.bn(f"{tpre}.1", fpre + ("bn",))
    m.conv(f"{tpre}.3", fpre + ("conv2",))


def _map_attention_pool(m: _Mapper, tpre: str, fpre: Tuple[str, ...]):
    m.conv(f"{tpre}.0", fpre + ("conv1",))
    m.bn(f"{tpre}.1", fpre + ("bn",))
    m.conv(f"{tpre}.3", fpre + ("conv2",))


def _map_refine_stage(m: _Mapper, tpre: str, fpre: Tuple[str, ...]):
    """Joint2BoneFeature (models/dir.py:19-130)."""
    for side in ("left", "right"):
        _map_mlp1d(m, f"{tpre}.img2joint_{side}.filters",
                   fpre + (f"img2joint_{side}", "filters"))
        _map_mlp1d(m, f"{tpre}.pos_emb_{side}", fpre + (f"pos_emb_{side}",))
        _map_gcn(m, f"{tpre}.gcn_{side}", fpre + (f"gcn_{side}",))
    _map_mlp1d(m, f"{tpre}.global_pos_emb", fpre + ("global_pos_emb",))
    _map_ste(m, f"{tpre}.interaction", fpre + ("interaction",))
    _map_mlp1d(m, f"{tpre}.proj_feat_emb", fpre + ("proj_feat_emb",))
    m.conv(f"{tpre}.fusion.0", fpre + ("fusion_conv1",))
    m.bn(f"{tpre}.fusion.1", fpre + ("fusion_bn",))
    m.conv(f"{tpre}.fusion.3", fpre + ("fusion_conv2",))
    # RegressorOffset heads
    m.dense(f"{tpre}.regressor.mano_left", fpre + ("regressor", "mano_left"))
    m.dense(f"{tpre}.regressor.mano_right", fpre + ("regressor", "mano_right"))
    m.dense(f"{tpre}.regressor.offset", fpre + ("regressor", "offset"))


def convert_torch_dir_state(sd: Dict[str, np.ndarray]):
    """Reference DIR state_dict -> (params, batch_stats) flax pytrees.

    Unused reference keys (MANO buffers, STE block 0, adjacency buffers,
    never-called avgpool/fc) are dropped — mirroring the strict=False
    load of apps/eval.py:108.
    """
    m = _Mapper(sd)
    _map_resnet(m, "backbone", ("backbone",))
    _map_attention_pool(m, "init_regressor.attention_left",
                        ("init_regressor", "attention_left"))
    _map_attention_pool(m, "init_regressor.attention_right",
                        ("init_regressor", "attention_right"))
    m.dense("init_regressor.offset", ("init_regressor", "offset"))
    m.dense("init_regressor.mano_left", ("init_regressor", "mano_left"))
    m.dense("init_regressor.mano_right", ("init_regressor", "mano_right"))

    d = ("decoder",)
    for res in ("skip_layer4", "fusion_layer4", "enhance_layer4",
                "skip_layer3", "fusion_layer3", "enhance_layer3"):
        _map_residual(m, f"decoder.{res}", d + (res,))
    _map_refine_stage(m, "decoder.projecter_4", d + ("projecter_4",))
    _map_refine_stage(m, "decoder.projecter_3", d + ("projecter_3",))
    m.conv("decoder.conv_final.0", d + ("final_conv1",), bias=False)
    m.bn("decoder.conv_final.1", d + ("final_bn",))
    m.conv("decoder.conv_final.3", d + ("final_conv2",))
    _map_seg_dense_head(m, "decoder.seg", d + ("seg",))
    _map_seg_dense_head(m, "decoder.dense", d + ("dense",))
    return m.params, m.stats


def load_torch_dir_checkpoint(pth_path: str):
    """Load the released DIR .pth and convert (requires torch)."""
    import torch
    state = torch.load(pth_path, map_location="cpu")
    sd = state["net"] if "net" in state else state
    sd = {k: v.numpy() for k, v in sd.items()
          if hasattr(v, "numpy")}
    return convert_torch_dir_state(sd)


def import_torch_resnet50(sd: Dict[str, np.ndarray]):
    """torchvision resnet50 state_dict -> our backbone (params, stats)
    subtrees (the reference copies matching keys only, models/dir.py:
    494-498 — avgpool/fc are absent from our tree and simply unused)."""
    m = _Mapper(sd)
    _map_resnet(m, "", ("",))
    # keys came in with an empty root; unwrap
    return m.params[""], m.stats[""]


def prune_to_target(converted: dict, target: dict) -> dict:
    """Drop converted entries absent from the target tree (e.g. Residual
    skip convs when in_dim == out_dim) and verify full coverage."""
    out = {}
    for k, v in target.items():
        if k not in converted:
            raise KeyError(f"missing converted parameter: {k}")
        if isinstance(v, dict):
            out[k] = prune_to_target(converted[k], v)
        else:
            if tuple(converted[k].shape) != tuple(v.shape):
                raise ValueError(
                    f"shape mismatch at {k}: {converted[k].shape} vs "
                    f"{v.shape}")
            out[k] = converted[k]
    return out
