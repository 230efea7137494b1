"""Load the ACTUAL reference torch code from /root/reference as a
numeric oracle.

The reference is pure torch + numpy + scipy + cv2 plus a few packages
not installed here (timm, torchvision, imgaug, yacs, chumpy). Every stub
below replaces ONLY import plumbing, never math that a parity test
exercises:

  * timm.models.layers — DropPath (never active: the reference always
    constructs blocks with drop_path=0, mixSTE.py:118), to_2tuple,
    trunc_normal_ (alias of torch.nn.init.trunc_normal_).
  * torchvision.models — DIR.__init__ only uses it to fetch ImageNet
    weights (models/dir.py:490-498); the stub returns a randomly
    initialized copy of the reference's own backbone so the copy loop
    runs but parity weights flow through the converter anyway.
  * imgaug / yacs — imported at module top of utils/utils.py and
    utils/config.py but only touched inside augmentation / asset-path
    helpers no oracle test calls.
  * chumpy — manopth's ready_arguments is replaced by a numpy shim that
    feeds our synthetic MANO arrays straight into the REAL manopth
    ManoLayer math (manopth/manolayer.py:65-110 reads only ``.r``
    arrays / ``.toarray()`` off it).

torch ``.cuda()`` is made a no-op (CPU-only box).
"""

from __future__ import annotations

import sys
import types

import numpy as np
import torch
import torch.nn as nn

REF = "/root/reference"
_installed = False


def _stub_module(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    sys.modules[name] = mod
    if "." in name:
        parent, child = name.rsplit(".", 1)
        setattr(sys.modules[parent], child, mod)
    return mod


def _install_stubs() -> None:
    if "timm" not in sys.modules:
        _stub_module("timm")
        _stub_module("timm.models")
        layers = _stub_module("timm.models.layers")

        class DropPath(nn.Module):
            def __init__(self, drop_prob=None):
                super().__init__()
                assert not drop_prob, "oracle stub: drop_path must be 0"

            def forward(self, x):
                return x

        layers.DropPath = DropPath
        layers.to_2tuple = lambda x: x if isinstance(x, tuple) else (x, x)
        layers.trunc_normal_ = torch.nn.init.trunc_normal_

    if "torchvision" not in sys.modules:
        _stub_module("torchvision")
        tvm = _stub_module("torchvision.models")

        class _Weights:
            IMAGENET1K_V2 = None

        def _random_resnet50(weights=None, **kw):
            from models.backbone.resnet import resnet50 as ref_resnet50
            return ref_resnet50()

        tvm.ResNet50_Weights = _Weights
        tvm.resnet50 = _random_resnet50

        # dataset/interhand.py:108 + apps/eval.py:50 use only
        # transforms.Normalize — the standard per-channel CHW affine.
        tvt = _stub_module("torchvision.transforms")

        class Normalize:
            def __init__(self, mean, std):
                self.mean = torch.tensor(mean, dtype=torch.float32)
                self.std = torch.tensor(std, dtype=torch.float32)

            def __call__(self, t):
                return ((t - self.mean[:, None, None])
                        / self.std[:, None, None])

        tvt.Normalize = Normalize

    if "imgaug" not in sys.modules:
        ia = _stub_module("imgaug")
        iaa = _stub_module("imgaug.augmenters")
        ia.augmenters = iaa
        # imgUtils.__init__ builds (but never invokes in any oracle
        # test) an iaa pipeline (utils/utils.py:258-260); the actual
        # motion blur used at dataset/interhand.py:190 is the cv2-based
        # imgUtils.motion_blur static method, not this pipeline.
        iaa.Sequential = lambda *a, **k: object()
        iaa.Sometimes = lambda *a, **k: object()
        iaa.MotionBlur = lambda *a, **k: object()

    if "yacs" not in sys.modules:
        _stub_module("yacs")
        yc = _stub_module("yacs.config")

        class CfgNode(dict):
            def __getattr__(self, k):
                return self[k]

            def __setattr__(self, k, v):
                self[k] = v

            def clone(self):
                return self

            def freeze(self):
                pass

            def merge_from_file(self, f):
                pass

        yc.CfgNode = CfgNode


def _noop_cuda() -> None:
    torch.Tensor.cuda = lambda self, *a, **k: self
    nn.Module.cuda = lambda self, *a, **k: self


def install() -> None:
    """Make /root/reference importable (idempotent)."""
    global _installed
    if _installed:
        return
    _install_stubs()
    _noop_cuda()
    for p in (REF, REF + "/manopth"):
        if p not in sys.path:
            sys.path.insert(0, p)
    _installed = True


# ---------------------------------------------------------------------------
# Synthetic MANO assets -> the real manopth ManoLayer
# ---------------------------------------------------------------------------

class _Arr:
    """Mimics a chumpy node: exposes the computed array as ``.r``."""

    def __init__(self, a):
        self.r = np.asarray(a)


def synthetic_ready_arguments(path: str, posekey4vposed: str = "pose"):
    """Drop-in for manopth's ready_arguments
    (mano/webuser/smpl_handpca_wrapper_HAND_only.py:22-67) built from our
    synthetic ManoModel — the real ManoLayer consumes only the fields
    below (manopth/manolayer.py:65-110)."""
    import scipy.sparse as sp

    from dir_tpu.mano.assets import MANO_PARENTS, synthetic_mano

    side = "left" if "LEFT" in str(path).upper() else "right"
    m = synthetic_mano(side, seed=0)
    return {
        "hands_components": np.asarray(m.hands_components),
        "hands_mean": np.asarray(m.hands_mean),
        "betas": _Arr(np.zeros(10, np.float32)),
        "shapedirs": _Arr(m.shapedirs),
        "posedirs": _Arr(m.posedirs),
        "v_template": _Arr(m.v_template),
        "J_regressor": sp.csr_matrix(np.asarray(m.j_regressor)),
        "weights": _Arr(m.weights),
        "f": np.asarray(m.faces, np.uint32),
        "kintree_table": np.stack(
            [np.asarray(MANO_PARENTS), np.arange(16)]).astype(np.int64),
    }


def patch_manopth_synthetic() -> None:
    """Route manopth's MANO pkl loading through the synthetic assets."""
    install()
    import manopth.manolayer as ml
    ml.ready_arguments = synthetic_ready_arguments


# ---------------------------------------------------------------------------
# Data-side MANO pkls (models/manolayer.py:100-152 loader format)
# ---------------------------------------------------------------------------

def write_data_mano_pkls(out_dir: str) -> dict:
    """Dump the synthetic MANO models in the pickle format the reference's
    data-side ManoLayer loads (models/manolayer.py:108-152: scipy-sparse
    J_regressor, (778,3,135) posedirs, kintree_table, ...). Returns the
    {'left': path, 'right': path} dict get_mano_path() would produce."""
    import os
    import pickle

    import scipy.sparse as sp

    from dir_tpu.mano.assets import MANO_PARENTS, synthetic_mano

    paths = {}
    for side in ("left", "right"):
        m = synthetic_mano(side, seed=0)
        jreg = np.asarray(m.j_regressor)
        data = {
            "hands_components": np.asarray(m.hands_components, np.float64),
            "J_regressor": sp.csc_matrix(jreg),
            "J": (jreg @ np.asarray(m.v_template)).astype(np.float64),
            "weights": np.asarray(m.weights, np.float64),
            "posedirs": np.asarray(m.posedirs, np.float64),
            "v_template": np.asarray(m.v_template, np.float64),
            "shapedirs": np.asarray(m.shapedirs),
            "hands_mean": np.asarray(m.hands_mean, np.float64),
            "f": np.asarray(m.faces, np.uint32),
            "kintree_table": np.stack(
                [np.asarray(MANO_PARENTS), np.arange(16)]).astype(np.int64),
        }
        p = os.path.join(out_dir, f"MANO_{side.upper()}.pkl")
        with open(p, "wb") as f:
            pickle.dump(data, f)
        paths[side] = p
    return paths


# ---------------------------------------------------------------------------
# apps/eval.py: module defs + the exact per-batch metric block
# ---------------------------------------------------------------------------

def load_ref_eval_module():
    """Import /root/reference/apps/eval.py under a non-clashing module
    name (our repo has its own ``apps`` package) — executes only the
    module-level defs (Jr, handDataset, xyz2uvd), not ``__main__``."""
    install()
    import importlib.util

    if "ref_apps_eval" in sys.modules:
        return sys.modules["ref_apps_eval"]
    spec = importlib.util.spec_from_file_location(
        "ref_apps_eval", REF + "/apps/eval.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_apps_eval"] = mod
    spec.loader.exec_module(mod)
    return mod


def extract_eval_metric_block() -> str:
    """Return the reference's per-batch metric computation
    (apps/eval.py:140-241 — the body of ``for data in tqdm(dataloader)``
    up to ``idx += 1``) dedented into exec-able source, so tests run the
    reference's OWN metric code rather than a re-reading of it."""
    with open(REF + "/apps/eval.py") as f:
        lines = f.read().splitlines()
    start = next(i for i, l in enumerate(lines)
                 if "for data in tqdm(dataloader):" in l) + 1
    end = next(i for i, l in enumerate(lines) if l.strip() == "idx += 1")
    body = [line[12:] for line in lines[start:end]]
    return "\n".join(body)
