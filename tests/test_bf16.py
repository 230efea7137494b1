"""bf16 compute-path smoke test: forward agrees with fp32 to bf16
tolerance and MANO outputs stay fp32."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # two full-model CPU compiles, ~1 min

from dir_tpu.config import ModelConfig
from dir_tpu.mano import synthetic_mano, fix_left_shapedirs
from dir_tpu.models.dir import DIR


def test_bf16_forward_close_to_fp32(rng):
    mano_r = synthetic_mano("right", seed=0)
    mano_l = fix_left_shapedirs(synthetic_mano("left", seed=0), mano_r)
    img = jnp.asarray(rng.randn(2, 256, 256, 3).astype(np.float32))

    cfg32 = ModelConfig(backbone_layers=(1, 1, 1, 1), dtype="float32")
    cfg16 = ModelConfig(backbone_layers=(1, 1, 1, 1), dtype="bfloat16")
    m32, m16 = DIR(cfg32), DIR(cfg16)
    variables = m32.init(jax.random.PRNGKey(0), img, mano_l, mano_r)

    out32 = m32.apply(variables, img, mano_l, mano_r)
    out16 = m16.apply(variables, img, mano_l, mano_r)

    # params are stored fp32: same tree works for both compute dtypes
    f32 = out32["stages"][-1]["pd_joint_xyz_left"]
    f16 = out16["stages"][-1]["pd_joint_xyz_left"]
    assert f16.dtype == jnp.float32  # MANO path stays fp32
    # Bound derived from measurement (VERDICT r4 weak #2): on this
    # fixture max|dxyz| = 3.6e-4 (2026-08-19, both hands); at the
    # metric level the full-depth bf16 trunk costs +0.0022 mm joint /
    # +0.0052 px 2d (tools/quant_accuracy.py --modes bf16, DESIGN.md
    # §8). 2e-3 gives ~5x headroom over the measured delta while still
    # catching any fp32-path regression into bf16 (those present as
    # 1e-2..1e-1 here).
    assert float(jnp.max(jnp.abs(f32 - f16))) < 2e-3
    assert out16["seg"].dtype == jnp.float32
