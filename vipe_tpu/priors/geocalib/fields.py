"""Perspective fields (up vector + latitude) for GeoCalib, in JAX.

Reference math: /root/reference/vipe/priors/geocalib/perspective_fields.py
and gravity.py.  Conventions preserved:

  * gravity from (roll, pitch): ``vec3d = (−sin r·cos p, −cos r·cos p, sin p)``
    (gravity.py:44-46); at rest this is (0, −1, 0), i.e. the IMAGE-UP
    direction (y grows downward in images), so the up-field projection uses
    vec3d directly;
  * up field: ``proj_up(uv) = normalize((g_x, g_y) − g_z · uv)`` over
    normalized image coordinates uv (perspective_fields.py:53-88).
  * latitude: ``lat(uv) = asin(bearing(uv) · g)`` (perspective_fields.py:189-216).
"""

from __future__ import annotations

import jax.numpy as jnp


def gravity_from_rp(roll, pitch):
    """(…,) roll, pitch → (…, 3) unit gravity vector (gravity.py:37-46)."""
    sr, cr = jnp.sin(roll), jnp.cos(roll)
    sp, cp = jnp.sin(pitch), jnp.cos(pitch)
    return jnp.stack([-sr * cp, -cr * cp, sp], axis=-1)


def rp_from_gravity(g):
    """Inverse of gravity_from_rp for unit vectors."""
    pitch = jnp.arcsin(jnp.clip(g[..., 2], -1.0, 1.0))
    roll = jnp.arctan2(-g[..., 0], -g[..., 1])
    return roll, pitch


def normalized_grid(h: int, w: int, focal, cx=None, cy=None):
    """Normalized image coords uv = (pix − c) / f  (camera.normalize)."""
    cx = (w - 1) / 2.0 if cx is None else cx
    cy = (h - 1) / 2.0 if cy is None else cy
    x = (jnp.arange(w, dtype=jnp.float32) - cx)
    y = (jnp.arange(h, dtype=jnp.float32) - cy)
    u, v = jnp.meshgrid(x, y, indexing="xy")
    return jnp.stack([u, v], axis=-1) / focal


def up_field(h: int, w: int, focal, roll, pitch, cx=None, cy=None):
    """(h, w, 2) normalized projected-up vectors (perspective_fields.py:53-88)."""
    g = gravity_from_rp(roll, pitch)
    uv = normalized_grid(h, w, focal, cx, cy)
    # reference formula exactly (perspective_fields.py:74): the vec3d
    # convention from from_rp already yields the image-up projection
    # ((0, −1) for an upright camera, y down in images)
    proj = g[..., None, None, :2] - g[..., 2, None, None, None] * uv
    norm = jnp.linalg.norm(proj, axis=-1, keepdims=True)
    return proj / jnp.maximum(norm, 1e-9)


def latitude_field(h: int, w: int, focal, roll, pitch, cx=None, cy=None):
    """(h, w) latitude in radians (perspective_fields.py:189-216).

    Latitude = angle between the pixel bearing and the horizon; +π/2 looks
    straight up.
    """
    g = gravity_from_rp(roll, pitch)
    uv = normalized_grid(h, w, focal, cx, cy)
    rays = jnp.concatenate([uv, jnp.ones_like(uv[..., :1])], axis=-1)
    rays = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
    lat = jnp.einsum("hwj,...j->...hw", rays, g)
    return jnp.arcsin(jnp.clip(lat, -1 + 1e-6, 1 - 1e-6))
