"""grid_sample parity vs torch (the oracle the reference relies on)."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from dir_tpu.ops.sampling import grid_sample_nhwc


def test_grid_sample_matches_torch(rng):
    b, h, w, c, n = 3, 16, 16, 8, 21
    feats = rng.randn(b, h, w, c).astype(np.float32)
    coords = rng.uniform(-1.3, 1.3, size=(b, n, 2)).astype(np.float32)

    got = np.asarray(grid_sample_nhwc(jnp.asarray(feats), jnp.asarray(coords)))

    t_feats = torch.from_numpy(feats).permute(0, 3, 1, 2)  # NCHW
    t_grid = torch.from_numpy(coords).unsqueeze(1)  # (B, 1, N, 2)
    want = F.grid_sample(t_feats, t_grid, mode="bilinear",
                         padding_mode="zeros", align_corners=False)
    want = want.squeeze(2).permute(0, 2, 1).numpy()  # (B, N, C)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_grid_sample_out_of_bounds_is_zero():
    feats = jnp.ones((1, 8, 8, 4), jnp.float32)
    coords = jnp.asarray([[[-5.0, -5.0], [5.0, 5.0]]], jnp.float32)
    got = np.asarray(grid_sample_nhwc(feats, coords))
    np.testing.assert_allclose(got, 0.0)


def test_grid_sample_rectangular_map(rng):
    b, h, w, c, n = 2, 8, 16, 4, 7
    feats = rng.randn(b, h, w, c).astype(np.float32)
    coords = rng.uniform(-1, 1, size=(b, n, 2)).astype(np.float32)
    got = np.asarray(grid_sample_nhwc(jnp.asarray(feats), jnp.asarray(coords)))
    t_feats = torch.from_numpy(feats).permute(0, 3, 1, 2)
    t_grid = torch.from_numpy(coords).unsqueeze(1)
    want = F.grid_sample(t_feats, t_grid, mode="bilinear",
                         padding_mode="zeros", align_corners=False)
    want = want.squeeze(2).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_grid_sample_mm_matches_gather(rng):
    from dir_tpu.ops.sampling import grid_sample_nhwc_mm
    feats = rng.randn(2, 16, 16, 8).astype(np.float32)
    coords = rng.uniform(-1.2, 1.2, size=(2, 21, 2)).astype(np.float32)
    a = np.asarray(grid_sample_nhwc(jnp.asarray(feats), jnp.asarray(coords)))
    b = np.asarray(grid_sample_nhwc_mm(jnp.asarray(feats),
                                       jnp.asarray(coords)))
    np.testing.assert_allclose(a, b, atol=1e-5)
