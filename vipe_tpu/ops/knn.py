"""Brute-force k-nearest-neighbours on TPU (matmul + top_k).

Replaces the reference's CUDA kd-tree (``/root/reference/csrc/utils_ext``,
``nearest_neighbours(query, tree, k)``; call sites use k=1 for SLAM-map depth
infill, interface.py:139, and k=5 for PriorDA scale/shift alignment,
priorda/depth_completion.py:325).  On the MXU a chunked distance matmul beats
tree traversal at these sizes (≤ ~3·10⁵ points)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnums=(2, 3))
def knn(query, points, k: int = 1, chunk: int = 4096):
    """query (Q, D), points (P, D) → (sq_dists (Q, k), idx (Q, k))."""
    p_sq = jnp.sum(points * points, axis=-1)

    def one_chunk(q):
        q_sq = jnp.sum(q * q, axis=-1, keepdims=True)
        d2 = q_sq + p_sq[None, :] - 2.0 * q @ points.T
        neg, idx = jax.lax.top_k(-d2, k)
        return -neg, idx

    Q = query.shape[0]
    pad = (-Q) % chunk
    qp = jnp.pad(query, ((0, pad), (0, 0)))
    chunks = qp.reshape(-1, chunk, query.shape[-1])
    d2, idx = jax.lax.map(one_chunk, chunks)
    return (
        d2.reshape(-1, k)[:Q],
        idx.reshape(-1, k)[:Q],
    )


def knn_infill_depth(depth: np.ndarray, max_dist_px: float = 8.0) -> np.ndarray:
    """Fill zero pixels of a sparse depth map from the nearest valid pixel
    (reference SLAMMap.project_map knn infill, interface.py:139)."""
    depth = np.asarray(depth, np.float32)
    vy, vx = np.nonzero(depth > 0)
    if len(vy) == 0:
        return depth
    zy, zx = np.nonzero(depth == 0)
    if len(zy) == 0:
        return depth
    pts = jnp.asarray(np.stack([vx, vy], -1), jnp.float32)
    qs = jnp.asarray(np.stack([zx, zy], -1), jnp.float32)
    d2, idx = knn(qs, pts, 1)
    d2 = np.asarray(d2[:, 0])
    idx = np.asarray(idx[:, 0])
    out = depth.copy()
    ok = d2 <= max_dist_px**2
    out[zy[ok], zx[ok]] = depth[vy[idx[ok]], vx[idx[ok]]]
    return out
