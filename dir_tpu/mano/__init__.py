"""MANO body-model runtime: assets and the differentiable layer."""

from dir_tpu.mano.assets import (
    ManoModel,
    load_mano,
    convert_mano_pkl,
    synthetic_mano,
    fix_left_shapedirs,
    load_mano_pair,
    MANO_PARENTS,
    JOINT_REORDER,
    TIPS_RIGHT,
    TIPS_LEFT,
    TIPS_DATA,
)
from dir_tpu.mano.layer import (
    mano_skin,
    mano_forward_pca6d,
    mano_forward_rotmat,
    pca_to_axis,
    axis_to_pca,
)

__all__ = [
    "ManoModel",
    "load_mano",
    "convert_mano_pkl",
    "synthetic_mano",
    "fix_left_shapedirs",
    "load_mano_pair",
    "MANO_PARENTS",
    "JOINT_REORDER",
    "TIPS_RIGHT",
    "TIPS_LEFT",
    "TIPS_DATA",
    "mano_skin",
    "mano_forward_pca6d",
    "mano_forward_rotmat",
    "pca_to_axis",
    "axis_to_pca",
]
