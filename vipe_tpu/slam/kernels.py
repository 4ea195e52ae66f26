"""Robust kernels for BA residual reweighting (reference
/root/reference/vipe/slam/ba/kernel.py:27-32 — defined there but not wired
into the default path either; available here for custom pipelines).

A robust kernel maps squared residuals to IRLS weights multiplied into the
per-pixel BA weights before assembly.
"""

from __future__ import annotations

import jax.numpy as jnp


class RobustKernel:
    def weight(self, r2):
        """r2: squared residual magnitude → multiplicative IRLS weight."""
        raise NotImplementedError


class HuberRobustKernel(RobustKernel):
    """w = 1 for |r| ≤ delta, delta/|r| beyond (reference kernel.py:27)."""

    def __init__(self, delta: float = 1.0):
        self.delta = delta

    def weight(self, r2):
        r = jnp.sqrt(jnp.maximum(r2, 1e-12))
        return jnp.where(r <= self.delta, 1.0, self.delta / r)


def apply_robust_kernel(weight, residual, kernel: RobustKernel):
    """weight/residual: (..., 2) per-pixel; returns reweighted weights."""
    r2 = jnp.sum(residual * residual, axis=-1, keepdims=True)
    return weight * kernel.weight(r2)
