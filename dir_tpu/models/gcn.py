"""Semantic graph convolutions over the 21-joint hand skeleton.

Reimplements the reference's PGraphConv / ResSimplePGCN
(SemGCN/p_graph_conv.py:9-62, SemGCN/p_gcn.py:63-73): per-node weight
matrices for the self and one-hop terms, with learned edge weights
softmax-normalized over each row's neighborhood. Dense 21x21 adjacency —
trivially MXU-shaped, no sparse machinery needed on TPU.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from dir_tpu.models.layers import TorchBatchNorm

# 21-joint hand skeleton edges (SemGCN/utils.py:66-71).
HAND_EDGES = (
    (0, 1), (1, 2), (2, 3), (3, 4),
    (0, 5), (5, 6), (6, 7), (7, 8),
    (0, 9), (9, 10), (10, 11), (11, 12),
    (0, 13), (13, 14), (14, 15), (15, 16),
    (0, 17), (17, 18), (18, 19), (19, 20),
)


def adjacency_from_edges(num_nodes: int, edges) -> np.ndarray:
    """Symmetric binary one-hop adjacency (no self loops).

    The reference row-normalizes (SemGCN/utils.py:27-43) but PGraphConv
    only consumes the nonzero mask, so the binary matrix is equivalent.
    """
    adj = np.zeros((num_nodes, num_nodes), np.float32)
    for i, j in edges:
        adj[i, j] = 1.0
        adj[j, i] = 1.0
    return adj


def hand_adjacency(num_joints: int = 21) -> np.ndarray:
    """Adjacency of the 21-joint skeleton (SemGCN/utils.py:66-71)."""
    return adjacency_from_edges(num_joints, HAND_EDGES)


class PGraphConv(nn.Module):
    """Two-branch graph conv with per-node weights and learned edge softmax.

    Branch 0 aggregates over self-loops (softmax over a single unmasked
    entry per row == identity, but kept faithful), branch 1 over one-hop
    neighbors.
    """

    out_features: int
    adjacency: tuple  # static nested tuple (J, J) of 0/1
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, J, C)
        j = x.shape[1]
        cin = x.shape[-1]
        adj = jnp.asarray(np.asarray(self.adjacency, np.float32))
        mask1 = adj > 0
        mask0 = jnp.eye(j, dtype=bool)

        w = self.param("w", _torch_xavier_uniform(gain=1.414),
                       (2, j, cin, self.out_features))
        # Learned edge scores, one per nonzero entry, init 1
        # (p_graph_conv.py:24-30).
        e0 = self.param("e0", nn.initializers.ones, (j,))
        n_edges = int(np.asarray(self.adjacency).sum())
        e1 = self.param("e1", nn.initializers.ones, (n_edges,))

        # Edge-score softmax always in fp32 (the -9e15 masking constant
        # and single-edge rows are ill-conditioned in bf16).
        neg = jnp.float32(-9e15)
        a0 = jnp.where(mask0, jnp.diag(e0.astype(jnp.float32)), neg)
        # Scatter e1 into mask1 positions in row-major order.
        flat_idx = np.nonzero(np.asarray(self.adjacency).reshape(-1) > 0)[0]
        a1 = jnp.full((j * j,), neg, jnp.float32).at[
            jnp.asarray(flat_idx)].set(e1.astype(jnp.float32)).reshape(j, j)

        a0 = nn.softmax(a0, axis=1).astype(self.dtype)
        a1 = nn.softmax(a1, axis=1).astype(self.dtype)
        del mask1  # the mask is encoded in a1's -inf pattern

        w = w.astype(self.dtype)
        x = x.astype(self.dtype)
        h0 = jnp.einsum("bjc,jcd->bjd", x, w[0])
        h1 = jnp.einsum("bjc,jcd->bjd", x, w[1])
        out = jnp.einsum("jk,bkd->bjd", a0, h0) + jnp.einsum(
            "jk,bkd->bjd", a1, h1)

        bias = self.param("bias", _pgc_bias_init(j), (self.out_features,))
        return out + bias


def _torch_xavier_uniform(gain: float):
    """torch nn.init.xavier_uniform_(gain) on an N-D tensor
    (p_graph_conv.py:20): torch computes fan_out from dim 0, fan_in from
    dim 1, and folds ALL trailing dims into the receptive field — so on
    the (2, J, Cin, Cout) weight fan_in = J*Cin*Cout, fan_out = 2*Cin*Cout.
    A generic per-matrix xavier does not reproduce this variance."""

    def init(key, shape, dtype=jnp.float32):
        import jax
        rf = int(np.prod(shape[2:])) if len(shape) > 2 else 1
        fan_in, fan_out = shape[1] * rf, shape[0] * rf
        bound = gain * np.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _pgc_bias_init(j: int):
    """Uniform(-1/sqrt(J), 1/sqrt(J)) — stdv uses W.size(1)=J in the
    reference (p_graph_conv.py:33-34)."""
    bound = 1.0 / np.sqrt(j)

    def init(key, shape, dtype=jnp.float32):
        import jax
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class GraphConvBlock(nn.Module):
    """PGraphConv -> BatchNorm(features) -> ReLU (SemGCN/p_gcn.py:7-27)."""

    out_features: int
    adjacency: tuple
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = PGraphConv(self.out_features, self.adjacency, dtype=self.dtype,
                       name="gconv")(x)
        x = TorchBatchNorm(use_running_average=not train,
                           dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


def get_hierarchy_sketch():
    """Hierarchical coarsening edge lists (SemGCN/utils.py:74-99):
    21 -> 11 -> 6 -> 1 node graphs."""
    return (
        HAND_EDGES,
        ((0, 1), (1, 2), (0, 3), (3, 4), (0, 5), (5, 6), (0, 7), (7, 8),
         (0, 9), (9, 10)),
        ((0, 1), (0, 2), (0, 3), (0, 4), (0, 5)),
        ((0, 0),),
    )


def get_hierarchy_mapping():
    """Node-pooling maps between hierarchy levels (SemGCN/utils.py:94-99)."""
    return (
        ((0,), (1, 2), (3, 4), (5, 6), (7, 8), (9, 10), (11, 12), (13, 14),
         (15, 16), (17, 18), (19, 20)),
        ((0,), (1, 2), (3, 4), (5, 6), (7, 8), (9, 10)),
        ((0, 1, 2, 3, 4, 5),),
    )


class SimplePGCN(nn.Module):
    """in -> hidden x num_layers -> out graph conv stack
    (SemGCN/p_gcn.py:44-60)."""

    in_dim: int
    hidden_dim: int
    out_dim: int
    num_layers: int = 4
    adjacency: tuple = None
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        adj = self.adjacency
        if adj is None:
            adj = tuple(map(tuple, hand_adjacency(x.shape[1])))
        x = GraphConvBlock(self.hidden_dim, adj, dtype=self.dtype,
                           name="gconv_in")(x, train)
        for i in range(self.num_layers):
            x = GraphConvBlock(self.hidden_dim, adj, dtype=self.dtype,
                               name=f"layer{i}")(x, train)
        return GraphConvBlock(self.out_dim, adj, dtype=self.dtype,
                              name="gconv_out")(x, train)


class SimplePoolGCN(nn.Module):
    """Hierarchically-pooling GCN encoder (SemGCN/p_gcn.py:76-128):
    graph conv at 21 nodes -> mean-pool to 11 -> conv -> pool to 6 ->
    conv -> pool to 1 -> Linear head. Unused by DIR (the reference never
    instantiates it) — provided for component-library parity.

    The reference's per-group AdaptiveAvgPool loop becomes one matmul
    with a row-normalized pooling matrix per level (MXU-shaped, no
    dynamic slicing)."""

    hid_dims: tuple = (64, 64, 64)
    out_dim: int = 64
    dtype: object = jnp.float32

    @staticmethod
    def pool_matrix(node_map) -> np.ndarray:
        """Row-normalized (M, N) one-hot pooling matrix: mat @ x == the
        reference's per-group mean pool (p_gcn.py:105-113, 119-127)."""
        n = max(max(g) for g in node_map) + 1
        mat = np.zeros((len(node_map), n), np.float32)
        for i, group in enumerate(node_map):
            mat[i, list(group)] = 1.0 / len(group)
        return mat

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        sketches = get_hierarchy_sketch()
        maps = get_hierarchy_mapping()
        sizes = (21, 11, 6)
        for i, hd in enumerate(self.hid_dims):
            adj = tuple(map(tuple, adjacency_from_edges(sizes[i],
                                                        sketches[i])))
            x = GraphConvBlock(hd, adj, dtype=self.dtype,
                               name=f"gconv{i}")(x, train)
            x = jnp.einsum("mn,bnc->bmc",
                           jnp.asarray(self.pool_matrix(maps[i]),
                                       self.dtype), x)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="fc")(x)
        return x[:, 0]


class ResSimplePGCN(nn.Module):
    """Stack of GraphConvBlocks at constant width (SemGCN/p_gcn.py:63-73).

    Note: despite the name there is no residual connection in the
    reference either — it is a plain sequential stack.
    """

    hidden_dim: int
    num_layers: int = 4
    adjacency: tuple = None
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        adj = self.adjacency
        if adj is None:
            adj = tuple(map(tuple, hand_adjacency(x.shape[1])))
        for i in range(self.num_layers):
            x = GraphConvBlock(self.hidden_dim, adj, dtype=self.dtype,
                               name=f"layer{i}")(x, train)
        return x
