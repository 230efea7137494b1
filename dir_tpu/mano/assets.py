"""MANO model assets: loading, conversion, and synthetic test models.

The official MANO pickle files are licensed and must be obtained by the
user (https://mano.is.tue.mpg.de). This module provides:

  * ``convert_mano_pkl`` — one-time chumpy-free conversion of the official
    ``MANO_{LEFT,RIGHT}.pkl`` to a plain ``.npz`` (the TPU-native asset
    format; mirrors the intent of models/manolayer.py:7-17 in the
    reference but drops the pickle format entirely).
  * ``load_mano`` — load a converted ``.npz`` (or a plain-numpy ``.pkl``)
    into a :class:`ManoModel` pytree of jnp arrays.
  * ``synthetic_mano`` — a deterministic, structurally-faithful random
    model (778 verts / 16 joints / 45 PCA components / 1538 faces) so the
    entire framework is testable without the licensed assets.
  * ``fix_left_shapedirs`` — the well-known MANO left-hand shapedirs sign
    fix (reference: models/dir.py:306-309, dataset/interhand.py:19-22).
"""

from __future__ import annotations

import io
import os
import pickle
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

# Kinematic tree of the 16 MANO joints (root + 3 per finger).
# parents[i] is the parent of joint i; matches MANO's kintree_table row 0.
MANO_PARENTS = (-1, 0, 1, 2, 0, 4, 5, 0, 7, 8, 0, 10, 11, 0, 13, 14)

# Per-level joint indices used for level-batched kinematics
# (manopth/manopth/manolayer.py:196-198): 5 fingers x 3 levels.
LEV1 = (1, 4, 7, 10, 13)
LEV2 = (2, 5, 8, 11, 14)
LEV3 = (3, 6, 9, 12, 15)
# After concatenating [root, lev1, lev2, lev3] transforms, this reorders
# back to MANO joint order (manopth/manolayer.py:227).
KIN_REORDER = (0, 1, 6, 11, 2, 7, 12, 3, 8, 13, 4, 9, 14, 5, 10, 15)

# Fingertip vertex indices appended as joints 16..20
# (manopth/manolayer.py:249-252; models/manolayer.py:297).
TIPS_RIGHT = (745, 317, 444, 556, 673)
TIPS_LEFT = (745, 317, 445, 556, 673)
# The data-side MANO uses the right-hand tips for both sides.
TIPS_DATA = (745, 317, 444, 556, 673)

# Reorder of [16 MANO joints + 5 tips] to the 21-joint convention
# (wrist, thumb..pinky chains) (manopth/manolayer.py:259).
JOINT_REORDER = (0, 13, 14, 15, 16, 1, 2, 3, 17, 4, 5, 6, 18,
                 10, 11, 12, 19, 7, 8, 9, 20)


class ManoModel(NamedTuple):
    """Constant pytree of MANO blend-model tensors (one hand side)."""

    v_template: jnp.ndarray       # (778, 3)
    shapedirs: jnp.ndarray        # (778, 3, 10)
    posedirs: jnp.ndarray         # (778, 3, 135)
    j_regressor: jnp.ndarray      # (16, 778)
    weights: jnp.ndarray          # (778, 16)
    hands_components: jnp.ndarray  # (45, 45) PCA basis (rows are components)
    hands_mean: jnp.ndarray       # (45,)
    faces: jnp.ndarray            # (1538, 3) int32
    tips: jnp.ndarray             # (5,) int32 fingertip vertex ids

    @property
    def num_verts(self) -> int:
        return self.v_template.shape[0]


def _maybe_dense(x) -> np.ndarray:
    """Densify scipy sparse / chumpy-wrapped arrays."""
    if hasattr(x, "toarray"):  # scipy sparse (J_regressor)
        return np.asarray(x.toarray())
    if hasattr(x, "r"):  # chumpy
        return np.asarray(x.r)
    return np.asarray(x)


class _ChumpyShim:
    """Minimal stand-in so official MANO pickles load without chumpy.

    The official files store ``shapedirs`` as a ``chumpy.reordering.Select``
    node. We only need the already-computed backing array; chumpy objects
    pickle their instance ``__dict__``, from which the array is recoverable
    in the cases MANO uses (Ch wrapping a plain ndarray, or Select over
    one).
    """

    def __init__(self, *args, **kwargs):
        pass

    def __setstate__(self, state):
        self.__dict__.update(state if isinstance(state, dict) else {})

    @property
    def r(self):
        d = self.__dict__
        for key in ("x", "a", "_data"):
            v = d.get(key)
            if v is None:
                continue
            arr = _maybe_dense(v)
            if d.get("idxs") is not None and key == "a":
                # chumpy Select node: gather then reshape
                idxs = np.asarray(d["idxs"])
                return arr.ravel()[idxs.ravel()].reshape(idxs.shape)
            return arr
        raise ValueError("cannot recover array from chumpy shim: "
                         f"keys={list(d.keys())}")


class _ManoUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if module.startswith("chumpy"):
            return _ChumpyShim
        return super().find_class(module, name)


def _load_raw_pkl(path: str) -> dict:
    with open(path, "rb") as f:
        return _ManoUnpickler(io.BytesIO(f.read()), encoding="latin1").load()


def convert_mano_pkl(pkl_path: str, npz_path: str, side: str) -> None:
    """Convert an official MANO pickle to the framework's .npz asset."""
    data = _load_raw_pkl(pkl_path)
    out = {
        "v_template": _maybe_dense(data["v_template"]).astype(np.float32),
        "shapedirs": _maybe_dense(data["shapedirs"]).astype(np.float32),
        "posedirs": _maybe_dense(data["posedirs"]).astype(np.float32),
        "J_regressor": _maybe_dense(data["J_regressor"]).astype(np.float32),
        "weights": _maybe_dense(data["weights"]).astype(np.float32),
        "hands_components": _maybe_dense(
            data["hands_components"]).astype(np.float32),
        "hands_mean": _maybe_dense(data["hands_mean"]).astype(np.float32),
        "faces": np.asarray(data["f"]).astype(np.int32),
        "side": np.asarray(side),
    }
    np.savez(npz_path, **out)


def _model_from_arrays(arrays: dict, side: str,
                       tips: tuple = None) -> ManoModel:
    if tips is None:
        tips = TIPS_LEFT if side == "left" else TIPS_RIGHT
    return ManoModel(
        v_template=jnp.asarray(arrays["v_template"], jnp.float32),
        shapedirs=jnp.asarray(arrays["shapedirs"], jnp.float32),
        posedirs=jnp.asarray(arrays["posedirs"], jnp.float32),
        j_regressor=jnp.asarray(arrays["J_regressor"], jnp.float32),
        weights=jnp.asarray(arrays["weights"], jnp.float32),
        hands_components=jnp.asarray(arrays["hands_components"], jnp.float32),
        hands_mean=jnp.asarray(arrays["hands_mean"], jnp.float32),
        faces=jnp.asarray(arrays["faces"], jnp.int32),
        tips=jnp.asarray(tips, jnp.int32),
    )


def load_mano(path: str, side: str, tips: tuple = None) -> ManoModel:
    """Load a MANO asset (.npz from convert_mano_pkl, or a raw/plain .pkl)."""
    if path.endswith(".npz"):
        with np.load(path, allow_pickle=False) as z:
            arrays = {k: z[k] for k in z.files}
    else:
        raw = _load_raw_pkl(path)
        arrays = {
            "v_template": _maybe_dense(raw["v_template"]),
            "shapedirs": _maybe_dense(raw["shapedirs"]),
            "posedirs": _maybe_dense(raw["posedirs"]),
            "J_regressor": _maybe_dense(raw["J_regressor"]),
            "weights": _maybe_dense(raw["weights"]),
            "hands_components": _maybe_dense(raw["hands_components"]),
            "hands_mean": _maybe_dense(raw["hands_mean"]),
            "faces": np.asarray(raw["f"]),
        }
    return _model_from_arrays(arrays, side, tips)


def fix_left_shapedirs(left: ManoModel, right: ManoModel) -> ManoModel:
    """Apply the MANO left-hand shapedirs sign fix if the bug is present
    (left and right shapedirs[:, 0, :] nearly identical — they should be
    mirrored; reference: models/dir.py:306-309)."""
    delta = jnp.sum(jnp.abs(left.shapedirs[:, 0, :] - right.shapedirs[:, 0, :]))
    flipped = left.shapedirs.at[:, 0, :].multiply(-1.0)
    new_shapedirs = jnp.where(delta < 1.0, flipped, left.shapedirs)
    return left._replace(shapedirs=new_shapedirs)


def load_mano_pair(assets_dir: str, tips_style: str = "network"):
    """Load (left, right) models with the shapedirs fix applied.

    tips_style: "network" uses the side-dependent manopth fingertips
    (manopth/manolayer.py:249-252); "data" uses right-hand tips for both
    sides as the data-side MANO does (models/manolayer.py:297).
    """
    def find(side):
        for name in (f"MANO_{side.upper()}.npz", f"MANO_{side.upper()}.pkl"):
            p = os.path.join(assets_dir, name)
            if os.path.exists(p):
                return p
        raise FileNotFoundError(
            f"No MANO_{side.upper()}.npz/.pkl under {assets_dir}; run "
            "tools/convert_mano.py on the official files, or use "
            "synthetic_mano() for testing.")

    if tips_style == "data":
        tips_l = tips_r = TIPS_DATA
    else:
        tips_l, tips_r = TIPS_LEFT, TIPS_RIGHT
    left = load_mano(find("left"), "left", tips_l)
    right = load_mano(find("right"), "right", tips_r)
    left = fix_left_shapedirs(left, right)
    return left, right


def synthetic_mano(side: str = "right", seed: int = 0,
                   tips: tuple = None) -> ManoModel:
    """Deterministic random model with the exact MANO structure.

    Verts/joints/PCA/face counts match the real model so every shape in
    the network is identical; only the geometry is random. Used by tests
    and the compile-check entry points.
    """
    rng = np.random.RandomState(seed + (1 if side == "left" else 0))
    nv, nj, npca, nf = 778, 16, 45, 1538
    v_template = rng.uniform(-0.08, 0.08, (nv, 3)).astype(np.float32)
    shapedirs = (rng.randn(nv, 3, 10) * 0.005).astype(np.float32)
    posedirs = (rng.randn(nv, 3, 135) * 0.002).astype(np.float32)
    # Each joint regressed from a handful of vertices, weights sum to 1.
    j_regressor = np.zeros((nj, nv), np.float32)
    for j in range(nj):
        idx = rng.choice(nv, 6, replace=False)
        w = rng.rand(6).astype(np.float32)
        j_regressor[j, idx] = w / w.sum()
    # Skinning weights: sparse-ish rows summing to 1.
    weights = rng.rand(nv, nj).astype(np.float32) ** 4
    weights /= weights.sum(1, keepdims=True)
    # Random orthogonal PCA basis.
    q, _ = np.linalg.qr(rng.randn(npca, npca))
    hands_components = q.astype(np.float32)
    hands_mean = (rng.randn(npca) * 0.1).astype(np.float32)
    faces = np.stack(
        [rng.choice(nv, 3, replace=False) for _ in range(nf)]).astype(np.int32)
    arrays = {
        "v_template": v_template,
        "shapedirs": shapedirs,
        "posedirs": posedirs,
        "J_regressor": j_regressor,
        "weights": weights,
        "hands_components": hands_components,
        "hands_mean": hands_mean,
        "faces": faces,
    }
    return _model_from_arrays(arrays, side, tips)
