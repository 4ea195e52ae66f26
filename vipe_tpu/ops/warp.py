"""Depth-based warping: camera rays, bilinear splatting, forward reprojection
(reference /root/reference/vipe/utils/depth.py:25-422) — jit/XLA throughout.

Used by the depth post-processing stage (SLAM-map prompting, reliability
masks) and visualization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import cameras as cam
from . import geom, lie


def pixel_grid_uv(ht: int, wd: int):
    """(H, W, 2) pixel-center coordinates (reference depth.py:25-51)."""
    u, v = geom.pixel_grid(ht, wd)
    return jnp.stack([u, v], axis=-1)


def camera_rays(intrinsics, ht: int, wd: int,
                camera_type: cam.CameraType = cam.CameraType.PINHOLE):
    """(H, W, 3) unit ray directions (reference depth.py:80-120, including
    the panorama equirect branch)."""
    u, v = geom.pixel_grid(ht, wd)
    if camera_type == cam.CameraType.PANORAMA:
        # panorama intrinsics are all-zero at the artifact level (reference
        # convention); the pixel-unit equirect scales follow from the size
        pts = cam.iproj_disp(
            camera_type, cam.panorama_intrinsics(ht, wd), u, v,
            jnp.ones_like(u),
        )
    else:
        pts = cam.iproj_disp(camera_type, intrinsics, u, v, jnp.ones_like(u))
    rays = pts[..., :3]
    return rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)


@functools.partial(jax.jit, static_argnums=3)
def bilinear_splat(values, coords, weights, out_hw):
    """Forward-splat per-pixel values to float coords with bilinear kernels
    (reference bilinear_splatting, depth.py:123-298).

    values: (N, C); coords: (N, 2) target (u, v); weights: (N,).
    Returns (H, W, C) accumulated values and (H, W) accumulated weight.
    """
    H, W = out_hw
    u, v = coords[:, 0], coords[:, 1]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = u - u0
    dv = v - v0

    acc = jnp.zeros((H * W, values.shape[-1]))
    wacc = jnp.zeros((H * W,))
    for (a, b, wgt) in (
        (0, 0, (1 - du) * (1 - dv)),
        (1, 0, du * (1 - dv)),
        (0, 1, (1 - du) * dv),
        (1, 1, du * dv),
    ):
        ui = (u0 + a).astype(jnp.int32)
        vi = (v0 + b).astype(jnp.int32)
        ok = (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
        idx = jnp.where(ok, vi * W + ui, 0)
        w_eff = jnp.where(ok, wgt * weights, 0.0)
        acc = acc.at[idx].add(values * w_eff[:, None])
        wacc = wacc.at[idx].add(w_eff)
    return acc.reshape(H, W, -1), wacc.reshape(H, W)


def reproject_depth(
    depth, intrinsics, pose_src_c2w, pose_dst_w2c, out_hw,
    camera_type: cam.CameraType = cam.CameraType.PINHOLE,
):
    """Forward-warp a depth map into another camera (reference
    depth.py:301-382): unproject, transform, project, z-weighted splat.

    Returns (depth_dst (H, W), weight (H, W)); weight 0 = hole.
    """
    ht, wd = depth.shape
    u, v = geom.pixel_grid(ht, wd)
    disp = jnp.where(depth > 0, 1.0 / jnp.maximum(depth, 1e-8), 0.0)
    pts = cam.iproj_disp(camera_type, intrinsics, u, v, disp)
    G = lie.se3_mul(pose_dst_w2c, pose_src_c2w)
    pts_dst = geom.act_homog(G, pts)
    coords = cam.proj_points(camera_type, intrinsics, pts_dst)
    z = pts_dst[..., 2] / jnp.maximum(pts_dst[..., 3], 1e-8)

    valid = (depth.reshape(-1) > 0) & (z.reshape(-1) > 1e-3)
    # soft z-buffering: weight by inverse depth so near surfaces dominate
    w = jnp.where(valid, 1.0 / jnp.maximum(z.reshape(-1), 1e-3) ** 2, 0.0)
    vals, wacc = bilinear_splat(
        z.reshape(-1, 1), coords.reshape(-1, 2), w, out_hw
    )
    depth_dst = jnp.where(wacc > 1e-8, vals[..., 0] / jnp.maximum(wacc, 1e-8), 0.0)
    return depth_dst, wacc


def reliable_depth_mask_range(depth, q_lo=0.02, q_hi=0.98, max_rel=None):
    """Range-based reliability mask (reference depth.py:385-422): quantile
    bounds plus optional max relative depth."""
    d = jnp.asarray(depth)
    valid = d > 0
    flat = jnp.where(valid, d, jnp.nan)
    lo = jnp.nanquantile(flat, q_lo)
    hi = jnp.nanquantile(flat, q_hi)
    mask = valid & (d >= lo) & (d <= hi)
    if max_rel is not None:
        mask = mask & (d <= max_rel * jnp.nanmedian(flat))
    return mask
