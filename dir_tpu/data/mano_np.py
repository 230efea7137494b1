"""Host-side numpy MANO forward (rotmat API) for the data pipeline.

The reference runs a torch MANO inside every DataLoader worker to
re-synthesize GT verts/joints from stored parameters
(dataset/interhand.py:128-158). Our host path is pure numpy — no
device round-trips, no framework dependency in the input pipeline.
Matches the data-side API (models/manolayer.py:251-323); parity with the
jnp layer is covered by tests/test_data.py.
"""

from __future__ import annotations

import numpy as np

from dir_tpu.mano.assets import (JOINT_REORDER, MANO_PARENTS, ManoModel)


class NumpyMano:
    """Vectorized numpy MANO (batch-first), built from a ManoModel."""

    def __init__(self, model: ManoModel):
        self.v_template = np.asarray(model.v_template, np.float64)
        self.shapedirs = np.asarray(model.shapedirs, np.float64)
        self.posedirs = np.asarray(model.posedirs, np.float64)
        self.j_regressor = np.asarray(model.j_regressor, np.float64)
        self.weights = np.asarray(model.weights, np.float64)
        self.hands_components = np.asarray(model.hands_components, np.float64)
        self.hands_mean = np.asarray(model.hands_mean, np.float64)
        self.faces = np.asarray(model.faces, np.int64)
        self.tips = np.asarray(model.tips, np.int64)

    @staticmethod
    def rodrigues(axis: np.ndarray) -> np.ndarray:
        """(N, 3) -> (N, 3, 3), classic formula with +1e-8 on the norm
        (models/manolayer.py:32-48)."""
        angle = np.linalg.norm(axis, axis=1, keepdims=True) + 1e-8
        ax = axis / angle
        sin = np.sin(angle)[..., None]
        cos = np.cos(angle)[..., None]
        z = np.zeros_like(ax[:, 0])
        k = np.stack([z, -ax[:, 2], ax[:, 1],
                      ax[:, 2], z, -ax[:, 0],
                      -ax[:, 1], ax[:, 0], z], 1).reshape(-1, 3, 3)
        kk = ax[:, :, None] * ax[:, None, :] - np.eye(3)
        return np.eye(3) + sin * k + (1.0 - cos) * kk

    def pca_to_rotmats(self, pca: np.ndarray) -> np.ndarray:
        axis = pca @ self.hands_components[: pca.shape[1]] + self.hands_mean
        return self.rodrigues(axis.reshape(-1, 3)).reshape(-1, 15, 3, 3)

    def axis_to_pca(self, axis: np.ndarray) -> np.ndarray:
        """(B, 45) axis-angle -> PCA coefficients
        (models/manolayer.py:178-182)."""
        inv = np.linalg.inv(self.hands_components)
        return (axis - self.hands_mean) @ inv

    # new_skel knuckle remap: joints 5/9/13/17 (index/middle/ring/pinky
    # MCP) replaced by surface-vertex midpoints (models/manolayer.py:
    # 317-321). An unused-by-DIR constructor option of the data-side
    # MANO, kept for API completeness.
    NEW_SKEL = ((5, 63, 144), (9, 271, 220), (13, 148, 290), (17, 770, 83))

    def __call__(self, root_rot: np.ndarray, pose: np.ndarray,
                 shape: np.ndarray, trans: np.ndarray | None = None,
                 scale: np.ndarray | None = None,
                 center_idx: int | None = None, use_pca: bool = True,
                 new_skel: bool = False):
        """root_rot (B,3,3); pose (B,ncomps)|(B,15,3,3); shape (B,10)."""
        b = root_rot.shape[0]
        local = self.pca_to_rotmats(pose) if use_pca else pose

        v_shaped = (np.einsum("vcs,bs->bvc", self.shapedirs, shape)
                    + self.v_template)
        j_rest = np.einsum("jv,bvc->bjc", self.j_regressor, v_shaped)
        pose_map = (local - np.eye(3)).reshape(b, 135)
        v_posed = v_shaped + np.einsum("vcp,bp->bvc", self.posedirs, pose_map)

        g = np.zeros((b, 16, 4, 4))
        g[:, :, 3, 3] = 1.0
        g[:, 0, :3, :3] = root_rot
        g[:, 0, :3, 3] = j_rest[:, 0]
        for i in range(1, 16):
            p = MANO_PARENTS[i]
            rel = np.zeros((b, 4, 4))
            rel[:, 3, 3] = 1.0
            rel[:, :3, :3] = local[:, i - 1]
            rel[:, :3, 3] = j_rest[:, i] - j_rest[:, p]
            g[:, i] = g[:, p] @ rel
        joints16 = g[:, :, :3, 3].copy()

        # inverse bind: subtract A @ (j, 0) from the translation column
        # (its 4th component is 0 since the bottom row is (0,0,0,1)).
        bind_t = np.einsum("bjik,bjk->bji", g[:, :, :, :3], j_rest)
        a = g.copy()
        a[:, :, :, 3] -= bind_t
        m = np.einsum("vj,bjik->bvik", self.weights, a)
        verts = (np.einsum("bvik,bvk->bvi", m[:, :, :3, :3], v_posed)
                 + m[:, :, :3, 3])

        joints = np.concatenate([joints16, verts[:, self.tips]], axis=1)
        joints = joints[:, list(JOINT_REORDER)]

        if center_idx is not None:
            c = joints[:, center_idx:center_idx + 1]
            verts = verts - c
            joints = joints - c
        if scale is not None:
            verts = verts * scale[:, None, None]
            joints = joints * scale[:, None, None]
        if trans is not None:
            verts = verts + trans[:, None, :]
            joints = joints + trans[:, None, :]
        if new_skel:
            for j, va, vb in self.NEW_SKEL:
                joints[:, j] = (verts[:, va] + verts[:, vb]) / 2
        return verts.astype(np.float32), joints.astype(np.float32)
