"""Checkpointing: orbax save/restore + torch checkpoint conversion.

Native format: orbax-checkpoint over the TrainState pytree (params,
batch_stats, opt_state, step) — the TPU-equivalent of the reference's
``torch.save({'net', 'optimizer', 'schedule', 'last_epoch'})``
(train.py:137-149).

Torch interop is table-driven: :func:`dir_mapping` enumerates every
(torch key, flax path, kind) pair of the reference DIR state_dict
(models/dir.py), from which both directions derive:
  * :func:`convert_torch_dir_state` — released ``DIR.pth`` -> flax trees
    (seeds benchmark-parity eval; apps/eval.py:107-108 loads with
    strict=False, mirrored here by dropping MANO buffers and the
    never-executed STE block 0).
  * :func:`export_torch_dir_state` — flax trees -> reference-layout
    state_dict (migration path back, and round-trip tests).
"""

from __future__ import annotations

import os
from typing import Dict, List, NamedTuple, Tuple

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


def load_checkpoint_weights(ckpt_dir: str, name: str = "latest"):
    """(params, batch_stats) out of a Trainer checkpoint WITHOUT a
    TrainState template — a target-less orbax restore returns the raw
    nested dict, so callers that don't know the optimizer tree (eval,
    serving, quantization calibration) can still load weights.
    (A template with opt_state=None fails orbax's structure check
    against a checkpoint that has one — caught by
    test_apps_cli.py::test_eval_cli_from_orbax_checkpoint.)"""
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    tree = ocp.StandardCheckpointer().restore(path)
    return tree["params"], tree["batch_stats"]


def save_meta(ckpt_dir: str, meta: dict) -> None:
    """Persist the loop state the TrainState pytree doesn't carry:
    next epoch, best metric, aug PRNG key (the reference saves
    last_epoch + schedule alongside the net, train.py:137-149)."""
    import json
    os.makedirs(ckpt_dir, exist_ok=True)
    tmp = os.path.join(ckpt_dir, "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(ckpt_dir, "meta.json"))


def load_meta(ckpt_dir: str) -> dict:
    import json
    path = os.path.join(ckpt_dir, "meta.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


# ---------------------------------------------------------------------------
# mapping table
# ---------------------------------------------------------------------------

class _EntryBase(NamedTuple):
    torch_key: str          # torch tensor name (state_dict key)
    path: Tuple[str, ...]   # flax tree path
    kind: str               # transform kind
    collection: str         # "params" | "batch_stats"


def Entry(torch_key, path, kind, collection) -> _EntryBase:
    # Normalize empty-prefix keys (".0.weight" -> "0.weight") so module
    # subtrees can be mapped standalone in tests.
    return _EntryBase(torch_key.lstrip("."), path, kind, collection)


def _entries_conv2d(tkey, path, bias=True):
    out = [Entry(f"{tkey}.weight", path + ("kernel",), "conv2d", "params")]
    if bias:
        out.append(Entry(f"{tkey}.bias", path + ("bias",), "raw", "params"))
    return out


def _entries_dense(tkey, path, bias=True):
    out = [Entry(f"{tkey}.weight", path + ("kernel",), "linear", "params")]
    if bias:
        out.append(Entry(f"{tkey}.bias", path + ("bias",), "raw", "params"))
    return out


def _entries_conv1d_dense(tkey, path):
    return [
        Entry(f"{tkey}.weight", path + ("kernel",), "conv1d_dense", "params"),
        Entry(f"{tkey}.bias", path + ("bias",), "raw", "params"),
    ]


def _entries_bn(tkey, path):
    return [
        Entry(f"{tkey}.weight", path + ("scale",), "raw", "params"),
        Entry(f"{tkey}.bias", path + ("bias",), "raw", "params"),
        Entry(f"{tkey}.running_mean", path + ("mean",), "raw", "batch_stats"),
        Entry(f"{tkey}.running_var", path + ("var",), "raw", "batch_stats"),
    ]


def _entries_ln(tkey, path):
    return [
        Entry(f"{tkey}.weight", path + ("scale",), "raw", "params"),
        Entry(f"{tkey}.bias", path + ("bias",), "raw", "params"),
    ]


def _entries_residual(tpre, fpre, has_skip=True):
    """Hourglass Residual (models/backbone/hourglass.py:33-70). torch
    always constructs skip_layer; flax only has it when channels differ —
    prune_to_target drops the surplus on import."""
    out = []
    out += _entries_bn(f"{tpre}.bn1", fpre + ("bn1",))
    out += _entries_conv2d(f"{tpre}.conv1.conv", fpre + ("conv1",))
    out += _entries_bn(f"{tpre}.bn2", fpre + ("bn2",))
    out += _entries_conv2d(f"{tpre}.conv2.conv", fpre + ("conv2",))
    out += _entries_bn(f"{tpre}.bn3", fpre + ("bn3",))
    out += _entries_conv2d(f"{tpre}.conv3.conv", fpre + ("conv3",))
    if has_skip:
        out += _entries_conv2d(f"{tpre}.skip_layer.conv", fpre + ("skip",))
    return out


def _entries_mlp1d(tpre, fpre):
    """Sequential(Conv1d, BN1d, ReLU, Conv1d) -> MLP1d."""
    return (_entries_conv1d_dense(f"{tpre}.0", fpre + ("fc1",))
            + _entries_bn(f"{tpre}.1", fpre + ("bn",))
            + _entries_conv1d_dense(f"{tpre}.3", fpre + ("fc2",)))


def _entries_bottleneck(tpre, fpre, has_down):
    out = []
    for i in (1, 2, 3):
        out += _entries_conv2d(f"{tpre}.conv{i}", fpre + (f"conv{i}",),
                               bias=False)
        out += _entries_bn(f"{tpre}.bn{i}", fpre + (f"bn{i}",))
    if has_down:
        out += _entries_conv2d(f"{tpre}.downsample.0", fpre + ("down_conv",),
                               bias=False)
        out += _entries_bn(f"{tpre}.downsample.1", fpre + ("down_bn",))
    return out


def _entries_basicblock(tpre, fpre, has_down):
    """BasicBlock (reference resnet.py:36-83) — resnet18/34 only."""
    out = []
    for i in (1, 2):
        out += _entries_conv2d(f"{tpre}.conv{i}", fpre + (f"conv{i}",),
                               bias=False)
        out += _entries_bn(f"{tpre}.bn{i}", fpre + (f"bn{i}",))
    if has_down:
        out += _entries_conv2d(f"{tpre}.downsample.0", fpre + ("down_conv",),
                               bias=False)
        out += _entries_bn(f"{tpre}.downsample.1", fpre + ("down_bn",))
    return out


def resnet_mapping(tpre="backbone", fpre=("backbone",),
                   layers=(3, 4, 6, 3), block="bottleneck") -> List[Entry]:
    sep = "." if tpre else ""
    out = _entries_conv2d(f"{tpre}{sep}conv1", fpre + ("conv1",), bias=False)
    out += _entries_bn(f"{tpre}{sep}bn1", fpre + ("bn1",))
    entries = (_entries_bottleneck if block == "bottleneck"
               else _entries_basicblock)
    for s, blocks in enumerate(layers):
        for b in range(blocks):
            # downsample exists when residual shapes mismatch
            # (torchvision resnet.py:192-199): every layerN_0 for
            # Bottleneck, but only stride-2 stages for BasicBlock.
            has_down = (b == 0 and (block == "bottleneck" or s > 0))
            out += entries(
                f"{tpre}{sep}layer{s + 1}.{b}", fpre + (f"layer{s + 1}_{b}",),
                has_down=has_down)
    return out


def _entries_gcn(tpre, fpre, num_layers=4):
    """ResSimplePGCN (SemGCN/p_gcn.py:63-73)."""
    out = []
    for i in range(num_layers):
        g = f"{tpre}.gconv_layers.{i}"
        f = fpre + (f"layer{i}",)
        out += [
            Entry(f"{g}.gconv.W", f + ("gconv", "w"), "raw", "params"),
            Entry(f"{g}.gconv.e_0", f + ("gconv", "e0"), "squeeze0",
                  "params"),
            Entry(f"{g}.gconv.e_1", f + ("gconv", "e1"), "squeeze0",
                  "params"),
            Entry(f"{g}.gconv.bias", f + ("gconv", "bias"), "raw", "params"),
        ]
        out += _entries_bn(f"{g}.bn", f + ("bn",))
    return out


def _entries_gcn_block(tpre, fpre):
    """One _GraphConv (SemGCN/p_gcn.py:7-27): PGraphConv + BN1d."""
    return [
        Entry(f"{tpre}.gconv.W", fpre + ("gconv", "w"), "raw", "params"),
        Entry(f"{tpre}.gconv.e_0", fpre + ("gconv", "e0"), "squeeze0",
              "params"),
        Entry(f"{tpre}.gconv.e_1", fpre + ("gconv", "e1"), "squeeze0",
              "params"),
        Entry(f"{tpre}.gconv.bias", fpre + ("gconv", "bias"), "raw",
              "params"),
    ] + _entries_bn(f"{tpre}.bn", fpre + ("bn",))


def _entries_pool_gcn(tpre, fpre):
    """SimplePoolGCN (SemGCN/p_gcn.py:76-128)."""
    out = []
    for i in range(3):
        out += _entries_gcn_block(f"{tpre}.gconv_layers_in_{i}",
                                  fpre + (f"gconv{i}",))
    out += _entries_dense(f"{tpre}.fc", fpre + ("fc",))
    return out


def _entries_hourglass(tpre, fpre, depth):
    """Recursive Hourglass (models/backbone/hourglass.py:73-97). torch
    Residuals always construct skip_layer; prune_to_target drops the
    unused ones on import."""
    out = []
    out += _entries_residual(f"{tpre}.up1", fpre + ("up1",))
    out += _entries_residual(f"{tpre}.low1", fpre + ("low1",))
    if depth > 1:
        out += _entries_hourglass(f"{tpre}.low2", fpre + ("low2",),
                                  depth - 1)
    else:
        out += _entries_residual(f"{tpre}.low2", fpre + ("low2",))
    out += _entries_residual(f"{tpre}.low3", fpre + ("low3",))
    return out


def _entries_ste(tpre, fpre, depth=4):
    """STE; torch block 0 is constructed-but-unused (mixSTE.py:197) and
    has no flax counterpart."""
    out = [Entry(f"{tpre}.spatial_pos_embed", fpre + ("spatial_pos_embed",),
                 "raw", "params")]
    for i in range(1, depth):
        b = f"{tpre}.STEblocks.{i}"
        f = fpre + (f"block{i}",)
        out += _entries_ln(f"{b}.norm1", f + ("norm1",))
        out += _entries_dense(f"{b}.attn.qkv", f + ("attn", "qkv"))
        out += _entries_dense(f"{b}.attn.proj", f + ("attn", "proj"))
        out += _entries_ln(f"{b}.norm2", f + ("norm2",))
        out += _entries_dense(f"{b}.mlp.fc1", f + ("mlp", "fc1"))
        out += _entries_dense(f"{b}.mlp.fc2", f + ("mlp", "fc2"))
    out += _entries_ln(f"{tpre}.spatial_norm", fpre + ("spatial_norm",))
    out += _entries_ln(f"{tpre}.head.0", fpre + ("head_norm",))
    out += _entries_dense(f"{tpre}.head.1", fpre + ("head",))
    return out


def _entries_head(tpre, fpre):
    """Sequential(Conv3x3, BN, ReLU, Conv1x1) heads (seg/dense/attention
    pool)."""
    return (_entries_conv2d(f"{tpre}.0", fpre + ("conv1",))
            + _entries_bn(f"{tpre}.1", fpre + ("bn",))
            + _entries_conv2d(f"{tpre}.3", fpre + ("conv2",)))


def _entries_refine_stage(tpre, fpre):
    """Joint2BoneFeature (models/dir.py:19-130)."""
    out = []
    for side in ("left", "right"):
        out += _entries_mlp1d(f"{tpre}.img2joint_{side}.filters",
                              fpre + (f"img2joint_{side}", "filters"))
        out += _entries_mlp1d(f"{tpre}.pos_emb_{side}",
                              fpre + (f"pos_emb_{side}",))
        out += _entries_gcn(f"{tpre}.gcn_{side}", fpre + (f"gcn_{side}",))
    out += _entries_mlp1d(f"{tpre}.global_pos_emb", fpre + ("global_pos_emb",))
    out += _entries_ste(f"{tpre}.interaction", fpre + ("interaction",))
    out += _entries_mlp1d(f"{tpre}.proj_feat_emb", fpre + ("proj_feat_emb",))
    out += _entries_conv2d(f"{tpre}.fusion.0", fpre + ("fusion_conv1",))
    out += _entries_bn(f"{tpre}.fusion.1", fpre + ("fusion_bn",))
    out += _entries_conv2d(f"{tpre}.fusion.3", fpre + ("fusion_conv2",))
    out += _entries_dense(f"{tpre}.regressor.mano_left",
                          fpre + ("regressor", "mano_left"))
    out += _entries_dense(f"{tpre}.regressor.mano_right",
                          fpre + ("regressor", "mano_right"))
    out += _entries_dense(f"{tpre}.regressor.offset",
                          fpre + ("regressor", "offset"))
    return out


def dir_mapping(backbone_layers=(3, 4, 6, 3)) -> List[Entry]:
    """Full reference-DIR <-> flax-DIR mapping table."""
    out = resnet_mapping("backbone", ("backbone",), backbone_layers)
    for side in ("left", "right"):
        out += _entries_head(f"init_regressor.attention_{side}",
                             ("init_regressor", f"attention_{side}"))
        out += _entries_dense(f"init_regressor.mano_{side}",
                              ("init_regressor", f"mano_{side}"))
    out += _entries_dense("init_regressor.offset",
                          ("init_regressor", "offset"))

    d = ("decoder",)
    for res in ("skip_layer4", "fusion_layer4", "enhance_layer4",
                "skip_layer3", "fusion_layer3", "enhance_layer3"):
        out += _entries_residual(f"decoder.{res}", d + (res,))
    out += _entries_refine_stage("decoder.projecter_4", d + ("projecter_4",))
    out += _entries_refine_stage("decoder.projecter_3", d + ("projecter_3",))
    out += _entries_conv2d("decoder.conv_final.0", d + ("final_conv1",),
                           bias=False)
    out += _entries_bn("decoder.conv_final.1", d + ("final_bn",))
    out += _entries_conv2d("decoder.conv_final.3", d + ("final_conv2",))
    out += _entries_head("decoder.seg", d + ("seg",))
    out += _entries_head("decoder.dense", d + ("dense",))
    return out


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------

_FWD = {
    "raw": lambda w: w,
    "conv2d": lambda w: np.transpose(w, (2, 3, 1, 0)),
    "linear": lambda w: np.transpose(w, (1, 0)),
    "conv1d_dense": lambda w: np.transpose(w[:, :, 0], (1, 0)),
    "squeeze0": lambda w: w[0],
}
_INV = {
    "raw": lambda w: w,
    "conv2d": lambda w: np.transpose(w, (3, 2, 0, 1)),
    "linear": lambda w: np.transpose(w, (1, 0)),
    "conv1d_dense": lambda w: np.transpose(w, (1, 0))[:, :, None],
    "squeeze0": lambda w: w[None],
}


def _set(tree: dict, path: Tuple[str, ...], value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _get(tree: dict, path: Tuple[str, ...]):
    node = tree
    for k in path:
        if not isinstance(node, dict) or k not in node:
            return None
        node = node[k]
    return node


def convert_torch_state(sd: Dict[str, np.ndarray], mapping: List[Entry],
                        strict: bool = False):
    """torch state_dict -> (params, batch_stats) flax pytrees."""
    params: dict = {}
    stats: dict = {}
    for e in mapping:
        if e.torch_key not in sd:
            if strict:
                raise KeyError(e.torch_key)
            continue
        value = jnp.asarray(_FWD[e.kind](np.asarray(sd[e.torch_key])))
        _set(params if e.collection == "params" else stats, e.path, value)
    return params, stats


def export_torch_state(params: dict, stats: dict,
                       mapping: List[Entry]) -> Dict[str, np.ndarray]:
    """flax pytrees -> reference-layout torch state_dict (skips leaves
    absent from the flax tree, e.g. identity Residual skips)."""
    sd = {}
    for e in mapping:
        tree = params if e.collection == "params" else stats
        leaf = _get(tree, e.path)
        if leaf is None:
            continue
        sd[e.torch_key] = _INV[e.kind](np.asarray(leaf))
    return sd


def convert_torch_dir_state(sd: Dict[str, np.ndarray],
                            backbone_layers=(3, 4, 6, 3)):
    return convert_torch_state(sd, dir_mapping(backbone_layers))


def export_torch_dir_state(params: dict, stats: dict,
                           backbone_layers=(3, 4, 6, 3)):
    return export_torch_state(params, stats, dir_mapping(backbone_layers))


def load_torch_dir_checkpoint(pth_path: str, backbone_layers=(3, 4, 6, 3)):
    """Load the released DIR .pth and convert (requires torch)."""
    import torch
    state = torch.load(pth_path, map_location="cpu", weights_only=False)
    sd = state["net"] if "net" in state else state
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    return convert_torch_dir_state(sd, backbone_layers)


def import_torch_resnet50(sd: Dict[str, np.ndarray]):
    """torchvision resnet50 state_dict -> our backbone (params, stats)
    subtrees (the reference copies matching keys only, models/dir.py:
    494-498 — avgpool/fc are unused)."""
    params, stats = convert_torch_state(sd, resnet_mapping("", ("",)))
    return params[""], stats[""]


def adapt_stem_s2d(params: dict) -> dict:
    """Rewrite an imported conv7 stem kernel (7, 7, C, 64) to the
    space-to-depth layout (4, 4, 4C, 64) wherever it appears, so
    reference/torchvision checkpoints load into
    ``backbone_stem="s2d"`` models (exact rewrite —
    resnet.stem_weights_to_s2d; equality test at
    tests/test_components.py::test_s2d_stem_exactly_matches_conv7)."""
    from dir_tpu.models.resnet import stem_weights_to_s2d

    def walk(tree):
        out = {}
        for k, v in tree.items():
            if (k == "conv1" and isinstance(v, dict) and "kernel" in v
                    and getattr(v["kernel"], "shape", ())[:2] == (7, 7)):
                out[k] = dict(v)
                out[k]["kernel"] = stem_weights_to_s2d(v["kernel"])
            elif isinstance(v, dict):
                out[k] = walk(v)
            else:
                out[k] = v
        return out

    return walk(params)


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
