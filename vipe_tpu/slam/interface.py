"""SLAM output interfaces (reference: /root/reference/vipe/slam/interface.py).

``SLAMMap`` holds the filtered keyframe point cloud; ``SLAMOutput`` is what
``SLAMSystem.run`` returns to the pipeline layer (trajectory is camera-to-
world, interface.py:145-163).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from ..ops import cameras as cam
from ..ops import lie


@dataclass
class SLAMMap:
    """Colored keyframe point cloud (reference SLAMMap, interface.py:26-143).

    xyz/rgb/mask are dense per-keyframe grids (N, h, w, ·); ``mask`` selects
    the depth-consistent points (depth_filter output).
    """

    xyz: np.ndarray  # (N, h, w, 3) world-space points
    rgb: np.ndarray  # (N, h, w, 3)
    mask: np.ndarray  # (N, h, w) bool
    frame_inds: np.ndarray  # (N,) original frame index per keyframe

    def masked_points(self):
        return self.xyz[self.mask], self.rgb[self.mask]

    def project_map(
        self,
        pose_w2c: np.ndarray,
        intrinsics: np.ndarray,
        camera_type: cam.CameraType,
        image_size: tuple[int, int],
        frame_idx: Optional[int] = None,
        window: int = 60,
        knn_infill: bool = False,
    ) -> np.ndarray:
        """Render the map depth from one camera (reference interface.py:98-143):
        gather points of keyframes near ``frame_idx``, transform to the camera,
        z-buffer project; returns (H, W) depth with 0 = empty.
        """
        import jax.numpy as jnp

        if frame_idx is not None:
            sel = np.abs(self.frame_inds - frame_idx) <= window
        else:
            sel = np.ones(len(self.frame_inds), bool)
        pts = self.xyz[sel][self.mask[sel]]
        if len(pts) == 0:
            return np.zeros(image_size, np.float32)

        pts_c = np.asarray(
            lie.se3_act(jnp.asarray(pose_w2c), jnp.asarray(pts, np.float32))
        )
        if camera_type == cam.CameraType.PANORAMA:
            # the equirect camera sees every direction: depth = range
            z = np.linalg.norm(pts_c, axis=-1)
        else:
            z = pts_c[:, 2]
        keep = z > 0.01
        pts_c, z = pts_c[keep], z[keep]
        if len(pts_c) == 0:
            return np.zeros(image_size, np.float32)
        H, W = image_size
        homog = np.concatenate([pts_c, np.ones_like(z[:, None])], -1)
        if camera_type == cam.CameraType.PANORAMA:
            # artifact-level panorama intrinsics are all zero; the projection
            # uses the pixel-unit equirect scales derived from the size
            intrinsics = cam.panorama_intrinsics(H, W)
        uv = np.asarray(
            cam.proj_points(
                camera_type, jnp.asarray(intrinsics), jnp.asarray(homog),
                limit_min_depth=False,
            )
        )
        ui = np.round(uv[:, 0]).astype(np.int64)
        vi = np.round(uv[:, 1]).astype(np.int64)
        ok = (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
        ui, vi, z = ui[ok], vi[ok], z[ok]
        depth = np.full(H * W, np.inf, np.float32)
        np.minimum.at(depth, vi * W + ui, z)  # z-buffer
        depth[~np.isfinite(depth)] = 0.0
        depth = depth.reshape(H, W)
        if knn_infill:
            from ..ops.knn import knn_infill_depth

            depth = knn_infill_depth(depth)
        return depth

    def uv_coverage_score(
        self,
        pose_w2c: np.ndarray,
        intrinsics: np.ndarray,
        camera_type: cam.CameraType,
        image_size: tuple[int, int],
        frame_idx: Optional[int] = None,
        grid: int = 10,
    ) -> float:
        """Fraction of a grid×grid partition of the image hit by ≥1 map point
        (reference AdaptiveDepthProcessor coverage, processors.py:189-195)."""
        depth = self.project_map(pose_w2c, intrinsics, camera_type, image_size, frame_idx)
        H, W = depth.shape
        hh, ww = H // grid, W // grid
        occ = depth[: hh * grid, : ww * grid].reshape(grid, hh, grid, ww)
        return float((occ > 0).any(axis=(1, 3)).mean())


@dataclass
class SLAMOutput:
    """Result of SLAMSystem.run (reference interface.py:145-163)."""

    trajectory: np.ndarray  # (T, 7) camera-to-world SE3 (rig base for V > 1)
    intrinsics: np.ndarray  # (D,) full-res intrinsics; (V, D) for a rig
    camera_type: cam.CameraType
    slam_map: Optional[SLAMMap] = None
    ba_residual: float = 0.0
    rig: Optional[np.ndarray] = None  # (V, 7) refined camera-to-rig SE3

    @property
    def trajectory_matrices(self) -> np.ndarray:
        import jax.numpy as jnp

        return np.asarray(lie.se3_matrix(jnp.asarray(self.trajectory)))
