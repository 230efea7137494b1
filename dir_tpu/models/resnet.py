"""ResNet-50 backbone returning the 4-level feature pyramid (NHWC).

Matches the torchvision-style v1.5 bottleneck network the reference uses
(models/backbone/resnet.py:85-258): stride-2 at the 3x3 conv, no
avgpool/fc (the reference builds them but never calls them in the pyramid
path — we simply don't have them). Returns [c1, c2, c3, c4] at strides
4/8/16/32 with channels 256/512/1024/2048.

ImageNet weights: the reference copies torchvision IMAGENET1K_V2 weights
at construction (models/dir.py:490-498). Here pretrained weights come via
the checkpoint converter (dir_tpu.train.checkpoint.import_torch_resnet50)
when a local torchvision state-dict file is available — there is no
network download inside model construction.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from dir_tpu.models.layers import BN_EPS, BN_MOMENTUM, conv_kernel_init


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 4
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        def bn(name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=BN_MOMENTUM, epsilon=BN_EPS,
                                dtype=self.dtype, name=name)

        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False,
                      kernel_init=conv_kernel_init, dtype=self.dtype,
                      name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        # Explicit symmetric padding=1, matching torch Conv2d(padding=1)
        # (reference models/backbone/resnet.py:35-37). "SAME" is NOT
        # equivalent under stride 2: XLA resolves it to asymmetric (0, 1)
        # padding on even inputs, shifting every tap by one pixel.
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=False,
                      kernel_init=conv_kernel_init, dtype=self.dtype,
                      name="conv2")(out)
        out = nn.relu(bn("bn2")(out))
        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                      kernel_init=conv_kernel_init, dtype=self.dtype,
                      name="conv3")(out)
        out = bn("bn3")(out)

        if self.downsample:
            identity = nn.Conv(self.planes * self.expansion, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, kernel_init=conv_kernel_init,
                               dtype=self.dtype, name="down_conv")(x)
            identity = bn("down_bn")(identity)
        return nn.relu(out + identity)


def space_to_depth(x: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/b, W/b, b*b*C), channel index
    ((a*b)+bb)*C + c for intra-block offset (a, bb)."""
    b_, h, w, c = x.shape
    x = x.reshape(b_, h // block, block, w // block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b_, h // block, w // block, block * block * c)


def stem_weights_to_s2d(w7: jnp.ndarray) -> jnp.ndarray:
    """Exact rewrite of the 7x7/stride-2 stem kernel (7, 7, C, O) into the
    4x4/stride-1 kernel (4, 4, 4C, O) applied after space_to_depth(2)
    with padding (2, 1) — the classic MLPerf-ResNet TPU stem trick.

    Derivation: output (i, j) of the original conv reads input rows
    2i+di-3, di in [0, 7); in 2-block coordinates row r = 2p+a, so
    di = 2*pi - 1 + a for block-row offset pi in [0, 4). Entries with
    di outside [0, 7) are zero.
    """
    import numpy as np
    w7 = np.asarray(w7)
    c, o = w7.shape[2], w7.shape[3]
    w4 = np.zeros((4, 4, 4 * c, o), w7.dtype)
    for pi in range(4):
        for pj in range(4):
            for a in range(2):
                for b_ in range(2):
                    di = 2 * pi - 1 + a
                    dj = 2 * pj - 1 + b_
                    if 0 <= di < 7 and 0 <= dj < 7:
                        ch = (a * 2 + b_) * c
                        w4[pi, pj, ch:ch + c] = w7[di, dj]
    return jnp.asarray(w4)


class ResNetPyramid(nn.Module):
    """ResNet backbone emitting [c1, c2, c3, c4].

    stem: "conv7" is the torchvision layout; "s2d" applies
    space-to-depth(2) then an equivalent 4x4/stride-1 conv — better MXU
    utilization on the 256^2 input (use stem_weights_to_s2d to convert
    imported 7x7 weights exactly).
    """

    layers: Sequence[int] = (3, 4, 6, 3)  # resnet50
    dtype: object = jnp.float32
    stem: str = "conv7"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        x = x.astype(self.dtype)
        if self.stem == "s2d":
            x = space_to_depth(x, 2)
            x = nn.Conv(64, (4, 4), strides=(1, 1),
                        padding=((2, 1), (2, 1)), use_bias=False,
                        kernel_init=conv_kernel_init, dtype=self.dtype,
                        name="conv1")(x)
        else:
            x = nn.Conv(64, (7, 7), strides=(2, 2),
                        padding=((3, 3), (3, 3)),
                        use_bias=False, kernel_init=conv_kernel_init,
                        dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))

        feats = []
        planes = (64, 128, 256, 512)
        for stage, (blocks, p) in enumerate(zip(self.layers, planes)):
            stride = 1 if stage == 0 else 2
            x = Bottleneck(p, stride=stride, downsample=True,
                           dtype=self.dtype,
                           name=f"layer{stage + 1}_0")(x, train)
            for b in range(1, blocks):
                x = Bottleneck(p, dtype=self.dtype,
                               name=f"layer{stage + 1}_{b}")(x, train)
            feats.append(x)
        return feats


def resnet50() -> ResNetPyramid:
    return ResNetPyramid(layers=(3, 4, 6, 3))
