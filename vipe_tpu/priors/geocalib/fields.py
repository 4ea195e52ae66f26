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
    """Normalized image coords uv = (pix − c) / f  (camera.normalize).

    Grid is INTEGER pixel indices with principal point c = (w/2, h/2) —
    the reference's convention exactly (camera.py:308-322 arange grid,
    c = size/2): a ((w−1)/2)-centered grid is half a pixel off and biases
    the recovered focal by ~3% at small fields."""
    cx = w / 2.0 if cx is None else cx
    cy = h / 2.0 if cy is None else cy
    x = (jnp.arange(w, dtype=jnp.float32) - cx)
    y = (jnp.arange(h, dtype=jnp.float32) - cy)
    u, v = jnp.meshgrid(x, y, indexing="xy")
    return jnp.stack([u, v], axis=-1) / focal


# --------------------------------------------------------------- distortion
#
# Scalar distortion scale s(r²) with uv_d = s·uv_u and its closed-form
# derivative/undistortion per model (reference camera.py:539-944):
#   simple_radial      s = 1 + k1·r²            (undistort: fixed point)
#   simple_divisional  s = (1−√(1−4k1r²))/(2k1r²)   (undistort: 1/(1+k1r²))
#   simple_mei         s = 1/(1 + k1·√(1+r²))   (closed-form undistort)


def distort_scale(model: str, uv, k1):
    r2 = jnp.sum(uv ** 2, -1, keepdims=True)
    if model == "simple_radial":
        return 1.0 + k1 * r2
    if model == "simple_divisional":
        t0 = jnp.sqrt(jnp.clip(1.0 - 4.0 * k1 * r2, 0.0))
        denom = 2.0 * k1 * r2
        return jnp.where(jnp.abs(denom) < 1e-9, 1.0,
                         (1.0 - t0) / jnp.where(jnp.abs(denom) < 1e-9,
                                                1.0, denom))
    if model == "simple_mei":
        return 1.0 / (1.0 + k1 * jnp.sqrt(1.0 + r2))
    raise ValueError(model)


def distort_scale_grad(model: str, uv, k1):
    """∂s/∂uv (…, 2) — camera.J_distort(·, "scale2pts")."""
    r2 = jnp.sum(uv ** 2, -1, keepdims=True)
    if model == "simple_radial":
        return 2.0 * k1 * uv
    if model == "simple_divisional":
        t0 = jnp.sqrt(jnp.clip(1.0 - 4.0 * k1 * r2, 1e-6))
        d1 = t0 * 2.0 * r2
        d2 = k1 * r2 ** 2
        denom = d1 * d2
        return uv * jnp.where(
            jnp.abs(denom) < 1e-12, 0.0,
            (4.0 * d2 - (1.0 - t0) * d1)
            / jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom),
        )
    if model == "simple_mei":
        sq = jnp.sqrt(1.0 + r2)
        d2 = (1.0 + k1 * sq) ** 2
        return -uv * k1 / (d2 * sq)
    raise ValueError(model)


def undistort(model: str, uv, k1):
    """Distorted normalized coords → undistorted (camera undistort)."""
    r2 = jnp.sum(uv ** 2, -1, keepdims=True)
    if model == "simple_radial":
        # fixed point on uv_u = uv_d / (1 + k1·|uv_u|²)
        out = uv
        for _ in range(5):
            out = uv / (1.0 + k1 * jnp.sum(out ** 2, -1, keepdims=True))
        return out
    if model == "simple_divisional":
        return uv / (1.0 + k1 * r2)
    if model == "simple_mei":
        fac = (k1 + jnp.sqrt(1.0 + (1.0 - k1 ** 2) * r2)) / (1.0 + r2)
        fac = fac / (fac - k1)
        return uv * fac
    raise ValueError(model)


def up_field(h: int, w: int, focal, roll, pitch, cx=None, cy=None,
             k1=None, model: str = "pinhole"):
    """(h, w, 2) normalized projected-up vectors (perspective_fields.py:53-88).

    For distorted models the projection maps through the distortion Jacobian
    (s·I + (∂s/∂uv)·uvᵀ) (perspective_fields.py:75-82)."""
    g = gravity_from_rp(roll, pitch)
    uv = normalized_grid(h, w, focal, cx, cy)
    # reference formula exactly (perspective_fields.py:74): the vec3d
    # convention from from_rp already yields the image-up projection
    # ((0, −1) for an upright camera, y down in images)
    proj = g[..., None, None, :2] - g[..., 2, None, None, None] * uv
    if model != "pinhole":
        s = distort_scale(model, uv, k1)
        off = distort_scale_grad(model, uv, k1)
        proj = s * proj + off * jnp.sum(uv * proj, -1, keepdims=True)
    norm = jnp.linalg.norm(proj, axis=-1, keepdims=True)
    return proj / jnp.maximum(norm, 1e-9)


def latitude_field(h: int, w: int, focal, roll, pitch, cx=None, cy=None,
                   k1=None, model: str = "pinhole"):
    """(h, w) latitude in radians (perspective_fields.py:189-216).

    Latitude = angle between the pixel bearing and the horizon; +π/2 looks
    straight up.  Distorted models undistort the grid before forming the
    bearings (camera.image2world, camera.py:356-362)."""
    g = gravity_from_rp(roll, pitch)
    uv = normalized_grid(h, w, focal, cx, cy)
    if model != "pinhole":
        uv = undistort(model, uv, k1)
    rays = jnp.concatenate([uv, jnp.ones_like(uv[..., :1])], axis=-1)
    rays = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
    lat = jnp.einsum("hwj,...j->...hw", rays, g)
    return jnp.arcsin(jnp.clip(lat, -1 + 1e-6, 1 - 1e-6))
