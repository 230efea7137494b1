"""upsample2x lowering equivalence (dir_tpu/models/layers.py).

The decoder's 2x bilinear upsample (reference: models/dir.py:441,458
F.interpolate(scale_factor=2, mode='bilinear', align_corners=False))
has two lowerings: jax.image.resize (default) and the depthwise
transposed-conv rewrite (UPSAMPLE_TCONV A/B knob). They must agree to
fp rounding on every shape, including the edge-clamped border rows —
otherwise the knob would silently change parity.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dir_tpu.models.layers import _upsample2x_tconv, upsample2x


@pytest.mark.parametrize("shape", [(2, 8, 8, 16), (1, 5, 7, 3),
                                   (3, 16, 16, 4), (1, 1, 1, 2),
                                   (1, 2, 9, 1)])
def test_tconv_matches_resize(rng, shape):
    b, h, w, c = shape
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    want = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="linear")
    got = _upsample2x_tconv(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-6)


def test_default_is_tconv():
    """The tconv lowering is the measured-best default (wins fp eval,
    int8 serving AND the train step — layers.py header); upsample2x
    must still equal the resize semantics to fp rounding, and
    UPSAMPLE_TCONV=0 must revert."""
    import dir_tpu.models.layers as layers

    assert layers._UPSAMPLE_TCONV == 1
    x = jnp.asarray(np.arange(2 * 3 * 3 * 2, dtype=np.float32)
                    .reshape(2, 3, 3, 2))
    np.testing.assert_allclose(
        np.asarray(upsample2x(x)),
        np.asarray(jax.image.resize(x, (2, 6, 6, 2), method="linear")),
        rtol=0, atol=1e-6)
