"""Dense projective geometry over the keyframe graph (pure JAX / XLA).

TPU-native rewrite of the reference's projective chain
(``/root/reference/vipe/slam/maths/geom.py``) and the two CUDA kernels the
Python side actually calls (``frame_distance``/``depth_filter`` from
``/root/reference/csrc/slam_ext/geom_kernels.cu:521,678``).  Everything here is
a vmapped map-reduce over edge lists with static shapes — ideal XLA territory,
no Pallas needed (the per-pixel math is bandwidth-trivial at the 64×48 SLAM
grid).

Conventions (same as reference):
  * ``poses``: (N, 7) SE3 world-to-camera.
  * ``disps``: (N, H, W) disparity = 1/depth at the 1/8-res SLAM grid.
  * edges ``ii, jj``: (E,) int32 frame indices; relative transform
    ``Gij = poses[jj] ∘ poses[ii]^-1`` maps camera-i points to camera-j.
  * homogeneous points [X, Y, Z, d] (see ops.cameras).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import cameras as cam
from . import lie

MIN_DEPTH = 0.25  # matches geom_kernels.cu:33


def pixel_grid(ht: int, wd: int, dtype=jnp.float32):
    """(H, W) u and v coordinate fields (u = x = column)."""
    v, u = jnp.meshgrid(
        jnp.arange(ht, dtype=dtype), jnp.arange(wd, dtype=dtype), indexing="ij"
    )
    return u, v


def act_homog(X, pts):
    """SE3 action on homogeneous [X, Y, Z, d] points: [R p + t d, d]."""
    p = pts[..., :3]
    d = pts[..., 3:4]
    q = X[..., 3:7]
    t = X[..., :3]
    return jnp.concatenate([lie.quat_rotate(q, p) + t * d, d], axis=-1)


def iproj_i_proj_j_disp(
    Gij,
    disps_i,
    intrinsics_i,
    intrinsics_j,
    camera_type: cam.CameraType,
    uv=None,
):
    """Reprojection chain: pixels of frame i → coords in frame j.

    Parity with reference ``geom.iproj_i_proj_j_disp`` (geom.py:187) without
    Jacobians (the BA computes those via jvp of this very function).

    Args:
      Gij: (E, 7) relative SE3 (cam_i → cam_j).
      disps_i: (E, H, W) disparities gathered per edge.
      intrinsics_i/j: (E, D) per-edge intrinsics.
      uv: optional (E, ..., 2) pixel coords; defaults to the full grid.

    Returns:
      coords: (E, H, W, 2) reprojected pixel coords in frame j.
      valid: (E, H, W) bool, target depth above MIN_DEPTH.
    """
    if uv is None:
        u, v = pixel_grid(disps_i.shape[-2], disps_i.shape[-1], disps_i.dtype)
        u = jnp.broadcast_to(u, disps_i.shape)
        v = jnp.broadcast_to(v, disps_i.shape)
    else:
        u, v = uv[..., 0], uv[..., 1]
    pts_i = cam.iproj_disp(camera_type, intrinsics_i, u, v, disps_i)
    pts_j = act_homog(Gij[:, None, None, :] if pts_i.ndim == 4 else Gij, pts_i)
    coords = cam.proj_points(camera_type, intrinsics_j, pts_j)
    if camera_type == cam.CameraType.PANORAMA:
        # an equirect camera sees every direction: validity is a minimum
        # RANGE, not a minimum forward depth.  pts = [xyz·d_true⁻¹·…]: the
        # homogeneous radius |xyz| equals d·range, so range > MIN_DEPTH
        # ⇔ |xyz| > MIN_DEPTH·d.
        r = jnp.linalg.norm(pts_j[..., :3], axis=-1)
        valid = r > MIN_DEPTH * pts_j[..., 3]
    else:
        valid = pts_j[..., 2] > MIN_DEPTH
    return coords, valid


def reproject(poses, disps, intrinsics, camera_type, ii, jj):
    """Reproject the dense grid of every edge (forward only, no Jacobians).

    ``intrinsics``: (D,) shared or (N, D) per-frame.
    Returns coords (E, H, W, 2) and valid (E, H, W).
    """
    Gij = lie.se3_mul(poses[jj], lie.se3_inv(poses[ii]))
    intr = jnp.broadcast_to(intrinsics, (poses.shape[0],) + intrinsics.shape[-1:]) \
        if intrinsics.ndim == 1 else intrinsics
    return iproj_i_proj_j_disp(Gij, disps[ii], intr[ii], intr[jj], camera_type)


def reproject_mv(poses, rig, disps, intrinsics, camera_type,
                 pi, qi, di, pj, qj):
    """Rig-aware reprojection (reference geom.iproj_i_proj_j_disp chain,
    geom.py:187-240): pixels of (frame pi, view qi) → coords in
    (frame pj, view qj).

    poses (N,7) per frame; rig (V,7); disps (N·V, H, W) frame-major
    flattened; intrinsics (V, D) per view.
    """
    Gij = lie.se3_mul(
        lie.se3_inv(rig[qj]),
        lie.se3_mul(poses[pj], lie.se3_mul(lie.se3_inv(poses[pi]), rig[qi])),
    )
    return iproj_i_proj_j_disp(
        Gij, disps[di], intrinsics[qi], intrinsics[qj], camera_type
    )


def frame_distance_mv(poses, rig, disps, intrinsics, pi, qi, di, pj, qj,
                      beta: float = 0.3):
    """Rig-aware frame distance: same two-term flow metric as
    ``frame_distance`` but over expanded (frame, view) edges.
    ``intrinsics``: (4,) or (V, 4) pinhole-equivalent."""
    V = rig.shape[0]
    intr = jnp.broadcast_to(intrinsics, (V, 4)) \
        if intrinsics.ndim == 1 else intrinsics[..., :4]
    pose_i = lie.se3_mul(lie.se3_inv(rig[qi]), poses[pi])
    pose_j = lie.se3_mul(lie.se3_inv(rig[qj]), poses[pj])
    return _frame_distance_impl(
        pose_i, pose_j, disps[di], intr[qi], intr[qj], beta
    )


def frame_distance(
    poses, disps, intrinsics, ii, jj, di=None, beta: float = 0.3
):
    """Mean induced optical flow between frame pairs.

    Parity with ``frame_distance_kernel`` (geom_kernels.cu:521-660).  Per
    edge the kernel makes ONE pass, i→j un-projecting with the disparity of
    frame ``di`` (default ``ii``) — the kernel's direction loop is
    ``for (n = 0; n < 1)`` at geom_kernels.cu:587, so the ix/jx swap at
    :655-658 is dead code.  The pass accumulates the full-SE3 flow magnitude
    with weight ``beta`` and the translation-only flow (rotation dropped)
    with weight ``1-beta``, counting only pixels whose transformed depth
    exceeds MIN_DEPTH; if fewer than 75% of pixels end up valid the distance
    saturates at 1000.

    Bidirectionality lives at the caller: ``GraphBuffer.frame_distance``
    averages this with the ``(jj, ii, dj)`` call (reference
    buffer.py:550-593), each direction saturating independently.

    ``intrinsics`` is the (4,) or (N, 4) *pinhole-equivalent* intrinsics (the
    reference converts non-pinhole models first, geom.py:335).
    """
    intr = jnp.broadcast_to(intrinsics, (poses.shape[0], 4)) \
        if intrinsics.ndim == 1 else intrinsics[..., :4]
    if di is None:
        di = ii
    return _frame_distance_impl(
        poses[ii], poses[jj], disps[di], intr[ii], intr[jj], beta
    )


def _frame_distance_impl(poses_i, poses_j, disps_e, intr_i_e, intr_j_e,
                         beta: float):
    """Vectorized core shared by frame_distance / frame_distance_mv:
    per-edge gathered poses (E,7), disparities (E,h,w), intrinsics (E,4)."""
    ht, wd = disps_e.shape[-2:]
    u, v = pixel_grid(ht, wd, disps_e.dtype)

    def one_direction(pose_i, pose_j, disp, intr_i, intr_j):
        Gij = lie.se3_mul(pose_j, lie.se3_inv(pose_i))
        fx, fy, cx, cy = intr_i
        X = (u - cx) / fx
        Y = (v - cy) / fy
        pts = jnp.stack([X, Y, jnp.ones_like(disp), disp], axis=-1)

        fxj, fyj, cxj, cyj = intr_j

        def flow_mag(pts_j):
            z = pts_j[..., 2]
            safe_z = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
            du = fxj * pts_j[..., 0] / safe_z + cxj - u
            dv = fyj * pts_j[..., 1] / safe_z + cyj - v
            return jnp.sqrt(du * du + dv * dv), z > MIN_DEPTH

        d_full, ok_full = flow_mag(act_homog(Gij, pts))
        tij = Gij[:3]
        pts_trans = jnp.concatenate(
            [pts[..., :3] + pts[..., 3:4] * tij, pts[..., 3:4]], axis=-1
        )
        d_tr, ok_tr = flow_mag(pts_trans)

        accum = beta * jnp.sum(jnp.where(ok_full, d_full, 0.0)) + (1 - beta) * jnp.sum(
            jnp.where(ok_tr, d_tr, 0.0)
        )
        valid = beta * jnp.sum(ok_full) + (1 - beta) * jnp.sum(ok_tr)
        total = float(ht * wd)  # beta + (1-beta) per pixel
        return accum, valid, total

    def per_edge(pose_i, pose_j, disp, intr_a, intr_b):
        accum, valid, total = one_direction(pose_i, pose_j, disp, intr_a, intr_b)
        return jnp.where(
            valid / (total + 1e-8) < 0.75, 1000.0, accum / jnp.maximum(valid, 1e-8)
        )

    return jax.vmap(per_edge)(poses_i, poses_j, disps_e, intr_i_e, intr_j_e)


def bilinear_sample(img, coords):
    """Bilinear sample img (H, W[, C]) at coords (..., 2) in (u, v) = (x, y).

    Out-of-range coords clamp to the border; use `in_bounds` for masking.
    """
    ht, wd = img.shape[0], img.shape[1]
    u = coords[..., 0]
    v = coords[..., 1]
    u0 = jnp.clip(jnp.floor(u), 0, wd - 2)
    v0 = jnp.clip(jnp.floor(v), 0, ht - 2)
    wu = jnp.clip(u - u0, 0.0, 1.0)
    wv = jnp.clip(v - v0, 0.0, 1.0)
    u0 = u0.astype(jnp.int32)
    v0 = v0.astype(jnp.int32)
    if img.ndim == 3:
        wu = wu[..., None]
        wv = wv[..., None]
    g00 = img[v0, u0]
    g01 = img[v0, u0 + 1]
    g10 = img[v0 + 1, u0]
    g11 = img[v0 + 1, u0 + 1]
    return (
        (1 - wv) * ((1 - wu) * g00 + wu * g01) + wv * ((1 - wu) * g10 + wu * g11)
    )


def in_bounds(coords, ht, wd, margin=0):
    u = coords[..., 0]
    v = coords[..., 1]
    return (u >= margin) & (v >= margin) & (u < wd - 1 - margin) & (v < ht - 1 - margin)


def depth_filter(poses, disps, intrinsics, inds, thresh, num_valid=None):
    """Multi-view depth consistency counter.

    Parity with ``depth_filter_kernel`` (geom_kernels.cu:678-790): for each
    frame ``inds[b]`` and each of the 6 temporal neighbors (±1, ±2, ±3),
    reproject every pixel; +1 if ANY of the 4 integer-corner disparities of
    the target frame agrees in depth within ``thresh[b]``.

    Args:
      poses: (N, 7), disps: (N, H, W), intrinsics: (4,) pinhole.
      inds: (B,) frame indices;  thresh: (B,).
      num_valid: dynamic count of REAL frames when the arrays carry bucket
        padding (padded neighbors must not count as agreeing views).
    Returns: counter (B, H, W) float32.
    """
    num, ht, wd = disps.shape
    if num_valid is not None:
        num = num_valid
    fx, fy, cx, cy = intrinsics[:4]
    u, v = pixel_grid(ht, wd, disps.dtype)

    def one_pair(ix, jx, t):
        ok_frame = (jx >= 0) & (jx < num)
        jx_c = jnp.clip(jx, 0, num - 1)
        Gij = lie.se3_mul(poses[jx_c], lie.se3_inv(poses[ix]))
        di = disps[ix]
        X = (u - cx) / fx
        Y = (v - cy) / fy
        pts = jnp.stack([X, Y, jnp.ones_like(di), di], axis=-1)
        pj = act_homog(Gij, pts)
        z = pj[..., 2]
        safe_z = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
        uj = fx * pj[..., 0] / safe_z + cx
        vj = fy * pj[..., 1] / safe_z + cy
        dj = pj[..., 3] / safe_z
        u0 = jnp.floor(uj)
        v0 = jnp.floor(vj)
        inb = (u0 >= 0) & (v0 >= 0) & (u0 < wd - 1) & (v0 < ht - 1)
        u0c = jnp.clip(u0, 0, wd - 2).astype(jnp.int32)
        v0c = jnp.clip(v0, 0, ht - 2).astype(jnp.int32)
        dn = disps[jx_c]
        depth_proj = 1.0 / jnp.where(jnp.abs(dj) < 1e-8, 1e-8, dj)
        agree = jnp.zeros_like(di, dtype=bool)
        for (dv_, du_) in ((0, 0), (0, 1), (1, 0), (1, 1)):
            dnk = dn[v0c + dv_, u0c + du_]
            depth_n = 1.0 / jnp.maximum(dnk, 1e-8)
            agree = agree | (jnp.abs(depth_proj - depth_n) < t)
        return jnp.where(inb & agree & ok_frame, 1.0, 0.0)

    def per_frame(ix, t):
        offsets = jnp.asarray([-1, -2, -3, 1, 2, 3])
        counts = jax.vmap(lambda o: one_pair(ix, ix + o, t))(offsets)
        return jnp.sum(counts, axis=0)

    return jax.vmap(per_frame)(inds, thresh)


def induced_flow(poses, disps, intrinsics, camera_type, ii, jj):
    """Flow field + validity induced by geometry (coords - grid)."""
    coords, valid = reproject(poses, disps, intrinsics, camera_type, ii, jj)
    ht, wd = disps.shape[-2:]
    u, v = pixel_grid(ht, wd, disps.dtype)
    grid = jnp.stack([u, v], axis=-1)
    return coords - grid, valid
