"""Camera models (pinhole / MEI / panorama) as pure-JAX projection functions.

Functional counterpart of the reference's torch class hierarchy at
``/root/reference/vipe/utils/cameras.py``.  Semantics preserved for parity:

  * "Homogeneous disparity points" have layout ``[X, Y, Z, d]`` and denote the
    3-D point ``(X, Y, Z) / d`` — SE3 action is ``[R@(X,Y,Z) + t*d, d]`` so no
    division is ever needed along the reprojection chain.
  * ``iproj_disp(u, v, disp) -> [X, Y, 1, disp]`` (unit-depth ray scaled form).
  * ``proj_points`` clamps ``Z < MIN_DEPTH`` to 1 (same guard as reference).
  * MEI is the 5-parameter unified model ``(fx, fy, cx, cy, k1)`` where the
    projection denominator is ``Z + k1 * |P|``.
  * Panorama is an equirectangular model with ``u, v ∈ [0, 1]``; convention
    ``x = sinφ sinθ, y = −cosφ, z = sinφ cosθ`` (θ = (u−.5)·2π, φ = v·π).
    Unlike the reference (which leaves ``proj_points`` unimplemented,
    cameras.py:389-396) we also provide the analytic forward projection.

Jacobians (Jz/Jf/Jp in the reference) are not hand-written here: the TPU BA
obtains them through ``jax.jvp`` of these forward functions, which XLA fuses
into the residual computation.
"""

from __future__ import annotations

from enum import Enum

import jax.numpy as jnp

MIN_DEPTH = 0.1


class CameraType(Enum):
    PINHOLE = "pinhole"
    PANORAMA = "panorama"
    SIMPLE_DIVISIONAL = "simple_divisional"
    MEI = "mei"

    def intrinsics_dim(self) -> int:
        if self == CameraType.MEI:
            return 5
        if self == CameraType.SIMPLE_DIVISIONAL:
            raise ValueError(f"Un-implemented camera type: {self}")
        return 4

    @property
    def n_distortion(self) -> int:
        """Number of trailing distortion parameters after (fx, fy, cx, cy)."""
        return self.intrinsics_dim() - 4


def _expand(intrinsics, ref):
    """Broadcast (..., D) intrinsics against a (..., spatial...) field."""
    extra = ref.ndim - (intrinsics.ndim - 1)
    shape = intrinsics.shape[:-1] + (1,) * extra + intrinsics.shape[-1:]
    return intrinsics.reshape(shape)


# ---------------------------------------------------------------------------
# Pinhole
# ---------------------------------------------------------------------------


def _pinhole_iproj(intr, u, v, disp):
    k = _expand(intr, disp)
    fx, fy, cx, cy = jnp.moveaxis(k, -1, 0)
    X = (u - cx) / fx
    Y = (v - cy) / fy
    return jnp.stack([X, Y, jnp.ones_like(disp), disp], axis=-1)


def _pinhole_proj(intr, pts, limit_min_depth=True):
    k = _expand(intr, pts[..., 0])
    fx, fy, cx, cy = jnp.moveaxis(k, -1, 0)
    X, Y, Z = pts[..., 0], pts[..., 1], pts[..., 2]
    if limit_min_depth:
        Z = jnp.where(Z < MIN_DEPTH, jnp.ones_like(Z), Z)
    d = 1.0 / Z
    return jnp.stack([fx * X * d + cx, fy * Y * d + cy], axis=-1)


# ---------------------------------------------------------------------------
# MEI (unified omnidirectional, 5 params: fx fy cx cy k1)
# ---------------------------------------------------------------------------


def _mei_iproj(intr, u, v, disp):
    k = _expand(intr, disp)
    fx, fy, cx, cy, k1 = jnp.moveaxis(k, -1, 0)
    ub = (u - cx) / fx
    vb = (v - cy) / fy
    r2 = ub * ub + vb * vb
    q = jnp.sqrt(jnp.maximum(1.0 + (1.0 - k1 * k1) * r2, 1e-12))
    factor = (k1 + q) / (1.0 + r2)
    scale = factor / (factor - k1)
    return jnp.stack([ub * scale, vb * scale, jnp.ones_like(disp), disp], axis=-1)


def _mei_proj(intr, pts, limit_min_depth=True):
    k = _expand(intr, pts[..., 0])
    fx, fy, cx, cy, k1 = jnp.moveaxis(k, -1, 0)
    X, Y, Z = pts[..., 0], pts[..., 1], pts[..., 2]
    if limit_min_depth:
        Z = jnp.where(Z < MIN_DEPTH, jnp.ones_like(Z), Z)
    r = jnp.sqrt(X * X + Y * Y + Z * Z)
    d = 1.0 / (Z + k1 * r)
    return jnp.stack([fx * X * d + cx, fy * Y * d + cy], axis=-1)


# ---------------------------------------------------------------------------
# Panorama (equirectangular, uv normalized to [0, 1])
# ---------------------------------------------------------------------------


def panorama_intrinsics(h, w):
    """Pixel-unit equirect parameterization: u = fx·θ + cx, v = fy·φ.

    The reference's panorama model works in NORMALIZED [0,1] coords with
    all-zero intrinsics and never projects (utils/cameras.py:357-400 — BA
    for panoramas relies on iproj only).  The TPU rebuild keeps the whole
    SLAM grid in PIXEL units (GRU flow deltas, corr windows, BA targets are
    all pixel-valued), so the panorama camera carries an explicit pixel
    scale instead: fx = w/2π, fy = h/π, cx = w/2, cy = 0.  The reference's
    normalized convention is the (w=1, h=1) special case.  Artifact output
    still writes all-zero intrinsics for panoramas (reference convention,
    streams/base.py:56)."""
    return jnp.asarray(
        [w / (2.0 * jnp.pi), h / jnp.pi, w / 2.0, 0.0], jnp.float32
    )


def _panorama_iproj(intr, u, v, disp):
    k = _expand(intr, disp)
    fx, fy, cx, cy = jnp.moveaxis(k, -1, 0)
    theta = (u - cx) / fx
    phi = (v - cy) / fy
    sin_phi = jnp.sin(phi)
    x = sin_phi * jnp.sin(theta)
    y = -jnp.cos(phi)
    z = sin_phi * jnp.cos(theta)
    return jnp.stack([x, y, z, disp], axis=-1)


def _panorama_proj(intr, pts, limit_min_depth=True):
    del limit_min_depth
    k = _expand(intr, pts[..., 0])
    fx, fy, cx, cy = jnp.moveaxis(k, -1, 0)
    X, Y, Z = pts[..., 0], pts[..., 1], pts[..., 2]
    r = jnp.sqrt(jnp.maximum(X * X + Y * Y + Z * Z, 1e-12))
    # pole guard: at X=Z=0 arctan2's jacfwd is NaN (0/0), which would
    # poison the BA Hessian even under zero weights — substitute a fixed
    # azimuth (zero gradient) there
    safe = X * X + Z * Z > 1e-12
    theta = jnp.arctan2(
        jnp.where(safe, X, 0.0), jnp.where(safe, Z, 1.0)
    )
    # clip guard keeps arccos' derivative finite at the poles too
    phi = jnp.arccos(jnp.clip(-Y / r, -1.0 + 1e-6, 1.0 - 1e-6))
    return jnp.stack([fx * theta + cx, fy * phi + cy], axis=-1)


_IPROJ = {
    CameraType.PINHOLE: _pinhole_iproj,
    CameraType.MEI: _mei_iproj,
    CameraType.PANORAMA: _panorama_iproj,
}
_PROJ = {
    CameraType.PINHOLE: _pinhole_proj,
    CameraType.MEI: _mei_proj,
    CameraType.PANORAMA: _panorama_proj,
}


def iproj_disp(camera_type: CameraType, intrinsics, u, v, disp):
    """Inverse-project pixel coords + disparity into homogeneous [X, Y, Z, d].

    Parity with reference ``BaseCameraModel.iproj_disp`` (cameras.py:60-81).
    """
    return _IPROJ[camera_type](intrinsics, u, v, disp)


def proj_points(camera_type: CameraType, intrinsics, pts, limit_min_depth=True):
    """Project homogeneous [X, Y, Z, d] points to pixel coords (2,).

    Parity with reference ``BaseCameraModel.proj_points`` (cameras.py:83-102).
    """
    return _PROJ[camera_type](intrinsics, pts, limit_min_depth)


def pinhole_equivalent(camera_type: CameraType, intrinsics):
    """Pinhole intrinsics equivalent of a camera (ref cameras.py:104-109,338-343).

    For MEI, rescales focal so the center-point scale slope is 1; for panorama
    returns the fixed 512×256 / 90°-FOV virtual camera the reference uses.
    """
    if camera_type == CameraType.PINHOLE:
        return intrinsics
    if camera_type == CameraType.MEI:
        k1 = intrinsics[..., 4:5]
        f = intrinsics[..., 0:2] / (1.0 + k1)
        return jnp.concatenate([f, intrinsics[..., 2:4]], axis=-1)
    if camera_type == CameraType.PANORAMA:
        base = jnp.asarray([256.0, 256.0, 256.0, 128.0], intrinsics.dtype)
        return jnp.broadcast_to(base, intrinsics.shape[:-1] + (4,))
    raise ValueError(f"Un-implemented camera type: {camera_type}")


def scaled_intrinsics(camera_type: CameraType, intrinsics, scale):
    """Rescale intrinsics for a resized image (distortion params untouched).

    Panorama intrinsics are the pixel-unit equirect scales
    (``panorama_intrinsics``) and rescale like pinhole ones."""
    pix = intrinsics[..., :4] * scale
    return jnp.concatenate([pix, intrinsics[..., 4:]], axis=-1)


def intrinsics_matrix(intrinsics):
    """(..., 4+) pinhole part → (..., 3, 3) K matrix."""
    fx, fy, cx, cy = jnp.moveaxis(intrinsics[..., :4], -1, 0)
    z = jnp.zeros_like(fx)
    o = jnp.ones_like(fx)
    K = jnp.stack([fx, z, cx, z, fy, cy, z, z, o], axis=-1)
    return K.reshape(K.shape[:-1] + (3, 3))
