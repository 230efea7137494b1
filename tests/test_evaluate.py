"""Metric harness tests vs a direct numpy oracle of apps/eval.py math."""

import numpy as np
import jax.numpy as jnp

from dir_tpu.mano import synthetic_mano
from dir_tpu.train import evaluate


def _oracle(pv_l, pv_r, off, gv_l, gv_r, cam, jreg, root_joint=0,
            scale_align=True):
    def reg(v):
        return np.einsum("jv,bvc->bjc", jreg, v)

    def uv(x):
        p = np.einsum("bnc,bdc->bnd", x, cam)
        return p[..., :2] / p[..., 2:]

    out = {}
    gj_l, gj_r = reg(gv_l), reg(gv_r)
    pj_l, pj_r = reg(pv_l), reg(pv_r)
    gt_off = gj_r[:, root_joint:root_joint + 1] - \
        gj_l[:, root_joint:root_joint + 1]

    res = {}
    for side, (pj, pv, gj, gv) in {
            "left": (pj_l, pv_l, gj_l, gv_l),
            "right": (pj_r, pv_r, gj_r, gv_r)}.items():
        root_p = pj[:, root_joint:root_joint + 1]
        root_g = gj[:, root_joint:root_joint + 1]
        if scale_align:
            sc = (np.linalg.norm(gj[:, 9] - gj[:, 0], axis=-1)
                  / np.linalg.norm(pj[:, 9] - pj[:, 0], axis=-1))
            sc = sc[:, None, None]
        else:
            sc = 1.0
        ja = (pj - root_p) * sc
        va = (pv - root_p) * sc
        jg = gj - root_g
        vg = gv - root_g
        res[f"joint_{side}"] = np.linalg.norm(ja - jg, axis=-1).mean()
        res[f"vert_{side}"] = np.linalg.norm(va - vg, axis=-1).mean()
        res[f"joint2d_{side}"] = np.linalg.norm(
            uv(ja + root_g) - uv(gj), axis=-1).mean()
    rel = off[:, None, :] * 0.15
    res["root"] = np.linalg.norm(gt_off - rel, axis=-1).mean()
    return res


def test_batch_metrics_matches_oracle(rng):
    model = synthetic_mano("right", seed=1)
    jreg = np.asarray(evaluate.extended_j_regressor(model))
    b = 3
    gv_l = rng.randn(b, 778, 3).astype(np.float32) * 0.05
    gv_r = rng.randn(b, 778, 3).astype(np.float32) * 0.05
    pv_l = gv_l + rng.randn(b, 778, 3).astype(np.float32) * 0.01
    pv_r = gv_r + rng.randn(b, 778, 3).astype(np.float32) * 0.01
    off = rng.randn(b, 3).astype(np.float32) * 0.1
    cam = np.tile(np.array([[500.0, 0, 128], [0, 500, 128], [0, 0, 1]],
                           np.float32), (b, 1, 1))
    # offset depths to keep z positive for projection
    gv_l[..., 2] += 2.0
    gv_r[..., 2] += 2.0
    pv_l[..., 2] += 2.0
    pv_r[..., 2] += 2.0

    valid = np.ones(b, np.float32)
    got = evaluate.batch_metrics(
        jnp.asarray(pv_l), jnp.asarray(pv_r), jnp.asarray(off),
        jnp.asarray(gv_l), jnp.asarray(gv_r), jnp.asarray(cam),
        jnp.asarray(jreg), jnp.asarray(jreg), jnp.asarray(valid))
    want = _oracle(pv_l.astype(np.float64), pv_r.astype(np.float64),
                   off.astype(np.float64), gv_l.astype(np.float64),
                   gv_r.astype(np.float64), cam.astype(np.float64), jreg)

    np.testing.assert_allclose(float(got["joint_left_sum_m"]) / b,
                               want["joint_left"], rtol=1e-4)
    np.testing.assert_allclose(float(got["vert_right_sum_m"]) / b,
                               want["vert_right"], rtol=1e-4)
    np.testing.assert_allclose(float(got["joint2d_left_sum_px"]) / b,
                               want["joint2d_left"], rtol=1e-3)
    np.testing.assert_allclose(float(got["root_sum_m"]) / b, want["root"],
                               rtol=1e-4)


def test_batch_metrics_valid_mask(rng):
    """Padded samples must not contribute."""
    model = synthetic_mano("right", seed=1)
    jreg = jnp.asarray(np.asarray(evaluate.extended_j_regressor(model)))
    b = 4
    gv = jnp.asarray(rng.randn(b, 778, 3).astype(np.float32) * 0.05 + 2.0)
    pv = gv + jnp.asarray(rng.randn(b, 778, 3).astype(np.float32) * 0.01)
    off = jnp.zeros((b, 3), jnp.float32)
    cam = jnp.asarray(np.tile(np.eye(3, dtype=np.float32) * 100, (b, 1, 1)))

    full = evaluate.batch_metrics(pv, pv, off, gv, gv, cam, jreg, jreg,
                                  jnp.ones(b))
    masked = evaluate.batch_metrics(pv, pv, off, gv, gv, cam, jreg, jreg,
                                    jnp.asarray([1.0, 1.0, 0.0, 0.0]))
    sliced = evaluate.batch_metrics(pv[:2], pv[:2], off[:2], gv[:2], gv[:2],
                                    cam[:2], jreg, jreg, jnp.ones(2))
    assert float(full["count"]) == 4
    assert float(masked["count"]) == 2
    np.testing.assert_allclose(float(masked["joint_left_sum_m"]),
                               float(sliced["joint_left_sum_m"]), rtol=1e-5)
    np.testing.assert_allclose(float(masked["vert_right_sum_m"]),
                               float(sliced["vert_right_sum_m"]), rtol=1e-5)


def test_summarize_keys():
    acc = {k: 1.0 for k in (
        "joint_left_sum_m", "joint_right_sum_m", "vert_left_sum_m",
        "vert_right_sum_m", "joint2d_left_sum_px", "joint2d_right_sum_px",
        "vert2d_left_sum_px", "vert2d_right_sum_px", "root_sum_m")}
    acc["count"] = 2.0
    s = evaluate.summarize(acc)
    assert s["joint_mean_all_mm"] == 500.0  # 1/2 m -> mm
    assert s["joint2d_mean_all_px"] == 0.5
