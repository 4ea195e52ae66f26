"""Trajectory / depth evaluation toolkit (reference
/root/reference/vipe/utils/geometry.py:123-678).

Umeyama trajectory alignment (Sim3 / SE3), ATE, pose averaging, and the
depth metrics used as parity targets (abs-rel, rmse-log, δ1).
Host-side numpy: these run on artifacts, not in the jit hot path.
"""

from __future__ import annotations

import numpy as np


def se3_to_matrix(poses: np.ndarray) -> np.ndarray:
    """(N, 7) [t, q(xyzw)] → (N, 4, 4)."""
    import jax.numpy as jnp

    from ..ops import lie

    return np.asarray(lie.se3_matrix(jnp.asarray(poses, jnp.float32)))


def matrix_to_se3(mats: np.ndarray) -> np.ndarray:
    import jax.numpy as jnp

    from ..ops import lie

    return np.asarray(lie.se3_from_matrix(jnp.asarray(mats, jnp.float32)))


def align_points_umeyama(src: np.ndarray, dst: np.ndarray, with_scale: bool = True):
    """Umeyama closed-form similarity aligning src → dst (reference
    geometry.py:499-616).  Returns (s, R, t) with dst ≈ s·R·src + t."""
    mu_s = src.mean(0)
    mu_d = dst.mean(0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var_s = (xs**2).sum() / len(src)
        s = float(np.trace(np.diag(D) @ S) / max(var_s, 1e-12))
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def align_trajectories(traj: np.ndarray, traj_gt: np.ndarray, with_scale: bool = True):
    """Align estimated c2w trajectory (N,7) to GT; returns aligned (N,7) and
    (s, R, t)."""
    pos = traj[:, :3]
    pos_gt = traj_gt[:, :3]
    s, R, t = align_points_umeyama(pos, pos_gt, with_scale)

    import jax.numpy as jnp

    from ..ops import lie

    pos_aligned = (s * (R @ pos.T)).T + t
    q = traj[:, 3:7]
    Rq = np.asarray(lie.quat_to_matrix(jnp.asarray(q, jnp.float32)))
    Rq_aligned = np.einsum("ij,njk->nik", R, Rq)
    q_aligned = np.asarray(lie.matrix_to_quat(jnp.asarray(Rq_aligned, jnp.float32)))
    return np.concatenate([pos_aligned, q_aligned], -1), (s, R, t)


def ate_rmse(traj: np.ndarray, traj_gt: np.ndarray, align: bool = True) -> float:
    """Absolute trajectory error RMSE after (optional) Umeyama alignment."""
    if align:
        traj, _ = align_trajectories(traj, traj_gt)
    err = traj[:, :3] - traj_gt[:, :3]
    return float(np.sqrt((err**2).sum(-1).mean()))


def depth_abs_relative_difference(pred, gt, mask=None):
    """abs-rel (reference geometry.py:618-638)."""
    pred, gt = np.asarray(pred), np.asarray(gt)
    if mask is None:
        mask = gt > 0
    return float(np.mean(np.abs(pred[mask] - gt[mask]) / gt[mask]))


def depth_rmse_log(pred, gt, mask=None):
    """rmse of log depth (reference geometry.py:640-658)."""
    pred, gt = np.asarray(pred), np.asarray(gt)
    if mask is None:
        mask = (gt > 0) & (pred > 0)
    d = np.log(pred[mask]) - np.log(gt[mask])
    return float(np.sqrt((d**2).mean()))


def depth_delta1_accuracy(pred, gt, mask=None):
    """δ < 1.25 accuracy (reference geometry.py:660-678)."""
    pred, gt = np.asarray(pred), np.asarray(gt)
    if mask is None:
        mask = (gt > 0) & (pred > 0)
    ratio = np.maximum(pred[mask] / gt[mask], gt[mask] / pred[mask])
    return float((ratio < 1.25).mean())


def se3_average(poses: np.ndarray) -> np.ndarray:
    """Mean SE3 (translation mean + chordal quaternion mean, geometry.py:412)."""
    t = poses[:, :3].mean(0)
    q = poses[:, 3:7]
    q = q * np.sign(q[:, 3:4] @ np.ones((1, 1)) + (q[:, 3:4] == 0))
    A = (q[:, :, None] @ q[:, None, :]).mean(0)
    w, v = np.linalg.eigh(A)
    q_mean = v[:, -1]
    q_mean = q_mean * np.sign(q_mean[3] if q_mean[3] != 0 else 1.0)
    return np.concatenate([t, q_mean])
