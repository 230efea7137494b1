"""STE interaction transformer over the 42 joint tokens.

Reimplements the mixSTE-derived blocks (transformer/mixSTE.py:11-205):
pre-LN ViT blocks with a learned spatial positional embedding and a
LayerNorm+Linear head. Faithfully preserved quirks:

  * the reference's forward loops ``for i in range(1, depth)`` so its
    block 0 is constructed but never executed (mixSTE.py:197-199). We
    build only the executed blocks (depth-1 of them); the torch
    checkpoint converter drops ``STEblocks.0.*``.
  * ``spatial_norm`` (eps=1e-6) is applied after every block, inside the
    loop (mixSTE.py:200).
  * the head's LayerNorm uses torch's default eps=1e-5 (mixSTE.py:189-192)
    while the block norms use 1e-6 (mixSTE.py:177).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)
        return x


class Attention(nn.Module):
    """Standard MHSA (mixSTE.py:52-97, comb=False path)."""

    num_heads: int
    qkv_bias: bool = True
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, n, c = x.shape
        head_dim = c // self.num_heads
        scale = head_dim ** -0.5

        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        # split along the (contiguous, 3-major) last axis — identical to
        # reshape(b, n, 3, h, d) + index on dim 2, but a cheap minor-axis
        # slice instead of a mid-tensor strided copy on TPU
        hd = (b, n, self.num_heads, head_dim)
        q = qkv[..., :c].reshape(hd)
        k = qkv[..., c:2 * c].reshape(hd)
        v = qkv[..., 2 * c:].reshape(hd)

        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class Block(nn.Module):
    """Pre-LN transformer block (mixSTE.py:100-141)."""

    num_heads: int
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        x = x + Attention(self.num_heads, self.qkv_bias, dtype=self.dtype,
                          name="attn")(
            nn.LayerNorm(use_fast_variance=False, epsilon=1e-6, dtype=self.dtype, name="norm1")(x))
        x = x + Mlp(int(c * self.mlp_ratio), c, dtype=self.dtype,
                    name="mlp")(
            nn.LayerNorm(use_fast_variance=False, epsilon=1e-6, dtype=self.dtype, name="norm2")(x))
        return x


class STE(nn.Module):
    """Spatial transformer encoder over joint tokens (mixSTE.py:158-205)."""

    num_joints: int = 42
    in_chans: int = 128
    out_dim: int = 64
    depth: int = 4
    num_heads: int = 4
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, J2, C)
        pos = self.param("spatial_pos_embed", nn.initializers.zeros,
                         (1, self.num_joints, self.in_chans))
        x = x + pos
        # One shared norm applied after every block (mixSTE.py:187,200).
        spatial_norm = nn.LayerNorm(use_fast_variance=False, epsilon=1e-6, dtype=self.dtype,
                                    name="spatial_norm")
        # Reference executes blocks 1..depth-1 only (mixSTE.py:197).
        for i in range(1, self.depth):
            x = Block(self.num_heads, self.mlp_ratio, self.qkv_bias,
                      dtype=self.dtype, name=f"block{i}")(x)
            x = spatial_norm(x)
        x = nn.LayerNorm(use_fast_variance=False, epsilon=1e-5, dtype=self.dtype, name="head_norm")(x)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="head")(x)
