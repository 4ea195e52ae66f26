"""Levenberg–Marquardt camera/gravity optimizer over perspective fields.

Reference: /root/reference/vipe/priors/geocalib/lm_optimizer.py:94-611 — ≤30
LM steps over (gravity roll/pitch, focal[, k1]) minimizing confidence-weighted
up-field + latitude-field residuals, with multiplicative lambda updates
(×10 on cost increase, ×0.1 on decrease, clamped to [1e-6, 1e2]) and
cost-convergence early stop.

TPU-native shape: the residual Jacobian over the 3–4 parameters comes from
one ``jax.jacfwd`` (the reference hand-derives per-pixel gradients,
lm_optimizer.py:362-430); the whole LM loop runs inside ONE jitted
``lax.while_loop`` — no per-iteration host round trips.

``shared_intrinsics`` stacks B frames that share focal but have independent
gravity (extractor calibrates 3 sampled frames, reference
processors.py:83-104): parameters are [roll_1..B, pitch_1..B, focal].
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .fields import latitude_field, up_field


class LMResult(NamedTuple):
    roll: jnp.ndarray      # (B,)
    pitch: jnp.ndarray     # (B,)
    focal: jnp.ndarray     # ()
    cost: jnp.ndarray      # ()
    n_iters: jnp.ndarray   # ()
    k1: object = None  # () shared distortion (None/0 for pinhole)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def lm_calibrate(
    h: int,
    w: int,
    max_iters: int,
    model: str,      # pinhole | simple_radial | simple_divisional | simple_mei
    up_obs,          # (B, h, w, 2) observed up field
    lat_obs,         # (B, h, w) observed latitude
    up_conf,         # (B, h, w) confidence weights
    lat_conf,        # (B, h, w)
    focal_init,      # () initial focal (pixels)
    roll_init,       # (B,)
    pitch_init,      # (B,)
    k1_init,         # () initial distortion
    lambda_init=0.1,
    atol=1e-8,
    rtol=1e-8,
):
    B = up_obs.shape[0]
    has_dist = model != "pinhole"

    def residuals(theta):
        roll = theta[:B]
        pitch = theta[B: 2 * B]
        focal = theta[2 * B]
        k1 = theta[2 * B + 1] if has_dist else None

        def per_frame(r, p, uo, lo, uc, lc):
            up = up_field(h, w, focal, r, p, k1=k1, model=model)
            lat = latitude_field(h, w, focal, r, p, k1=k1, model=model)
            r_up = (up - uo) * jnp.sqrt(jnp.maximum(uc, 0.0))[..., None]
            r_lat = (lat - lo) * jnp.sqrt(jnp.maximum(lc, 0.0))
            return jnp.concatenate([r_up.reshape(-1), r_lat.reshape(-1)])

        rs = jax.vmap(per_frame)(
            jnp.asarray(roll), jnp.asarray(pitch), up_obs, lat_obs, up_conf, lat_conf
        )
        return rs.reshape(-1)

    def cost_of(theta):
        r = residuals(theta)
        return jnp.sum(r * r)

    parts = [jnp.atleast_1d(roll_init), jnp.atleast_1d(pitch_init),
             jnp.atleast_1d(focal_init)]
    if has_dist:
        parts.append(jnp.atleast_1d(k1_init))
    theta0 = jnp.concatenate(parts).astype(jnp.float32)

    def body(state):
        theta, lamb, prev_cost, it, done = state
        J = jax.jacfwd(residuals)(theta)           # (N, P)
        r = residuals(theta)
        H = J.T @ J
        g = J.T @ r
        diag = jnp.diag(jnp.diag(H)) * lamb
        delta = jnp.linalg.solve(H + diag + 1e-6 * jnp.eye(H.shape[0]), -g)
        new_theta = theta + delta
        new_cost = cost_of(new_theta)
        accept = new_cost < prev_cost
        theta = jnp.where(accept, new_theta, theta)
        cost = jnp.where(accept, new_cost, prev_cost)
        # lambda schedule (lm_optimizer.py:99-110)
        lamb = jnp.clip(lamb * jnp.where(accept, 0.1, 10.0), 1e-6, 1e2)
        converged = jnp.abs(new_cost - prev_cost) < atol + rtol * jnp.abs(prev_cost)
        return theta, lamb, cost, it + 1, done | (accept & converged)

    def cond(state):
        _, _, _, it, done = state
        return (it < max_iters) & (~done)

    init = (theta0, jnp.float32(lambda_init), cost_of(theta0),
            jnp.int32(0), jnp.bool_(False))
    theta, lamb, cost, it, _ = jax.lax.while_loop(cond, body, init)
    return LMResult(
        roll=theta[:B], pitch=theta[B: 2 * B], focal=theta[2 * B],
        cost=cost, n_iters=it,
        k1=theta[2 * B + 1] if has_dist else jnp.zeros(()),
    )


def calibrate_from_fields(
    up_obs, lat_obs, up_conf=None, lat_conf=None,
    focal_init: Optional[float] = None,
    max_iters: int = 30,
    model: str = "pinhole",
    k1_init: float = 0.0,
):
    """Convenience wrapper: observed fields (B, h, w, ·) → (focal, roll, pitch).

    focal_init defaults to w (≈53° FOV), the reference's uncalibrated prior.
    """
    import numpy as np

    up_obs = jnp.asarray(up_obs)
    if up_obs.ndim == 3:
        up_obs = up_obs[None]
    lat_obs = jnp.asarray(lat_obs)
    if lat_obs.ndim == 2:
        lat_obs = lat_obs[None]
    B, h, w = lat_obs.shape
    if up_conf is None:
        up_conf = jnp.ones((B, h, w))
    if lat_conf is None:
        lat_conf = jnp.ones((B, h, w))
    if focal_init is None:
        focal_init = float(w)

    res = lm_calibrate(
        h, w, max_iters, model, up_obs, lat_obs,
        jnp.asarray(up_conf), jnp.asarray(lat_conf),
        jnp.float32(focal_init), jnp.zeros((B,)), jnp.zeros((B,)),
        jnp.float32(k1_init),
    )
    return res
