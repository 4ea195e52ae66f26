"""Live SLAM telemetry (reference system.py:243-246, buffer.py:705-747,
factor_graph.py:490-495: when ``slam.visualize=true`` the reference streams
poses + point clouds to a `rerun` viewer as tracking progresses).

`rerun` isn't in this image, and a per-keyframe socket stream would
serialize the TPU pipeline on device→host readbacks.  The TPU-native
equivalent is a polled snapshot file: every ``every`` keyframes the writer
fetches the live keyframe trajectory, the newest keyframe's /8 disparity
and rgb in ONE bounded device_get (~0.7 MB), builds a preview cloud
host-side, and atomically replaces ``<dir>/<name>_live.npz``.  Any external
process (a notebook, a file-watcher UI) can read a consistent snapshot at
any time; cost is paid only when telemetry is enabled.

The preview cloud uses the pinhole-equivalent intrinsics for every camera
model — it is a monitoring aid, not an output; exact clouds come from
``GraphBuffer.extract_slam_map`` at the end of the run.
"""

from __future__ import annotations

import os
import pathlib
import time

import numpy as np


class TelemetryWriter:
    def __init__(self, out_dir, name: str = "slam", every: int = 8):
        self.dir = pathlib.Path(out_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.name = name
        self.every = max(int(every), 1)
        self._last_n = 0

    @property
    def snapshot_path(self) -> pathlib.Path:
        return self.dir / f"{self.name}_live.npz"

    def update(self, buffer, force: bool = False) -> bool:
        """Write a snapshot if ``every`` new keyframes arrived (or forced).
        Returns True when a snapshot was written."""
        n = buffer.n_frames
        if n == 0 or (not force and n - self._last_n < self.every):
            return False
        self._last_n = n

        import jax

        V = buffer.n_views
        last_slot = (n - 1) * V  # newest keyframe, view 0 slot
        fetched = jax.device_get({
            "poses": buffer.poses[:n],  # per-frame rig-base w2c
            "disp": buffer.disps[last_slot],
            "image": buffer.images[last_slot],
            "intr8": buffer.pinhole_grid_intrinsics.reshape(-1, 4)[0],
        })
        poses_w2c = np.asarray(fetched["poses"], np.float32)
        disp = np.asarray(fetched["disp"], np.float32)
        rgb = np.asarray(fetched["image"], np.uint8)
        fx, fy, cx, cy = np.asarray(fetched["intr8"], np.float32)[:4]

        ht, wd = disp.shape
        u, v = np.meshgrid(
            np.arange(wd, dtype=np.float32), np.arange(ht, dtype=np.float32)
        )
        z = 1.0 / np.clip(disp, 1e-4, None)
        pts_cam = np.stack(
            [(u - cx) / fx * z, (v - cy) / fy * z, z], -1
        ).reshape(-1, 3)
        cols = rgb[:: max(rgb.shape[0] // ht, 1),
                   :: max(rgb.shape[1] // wd, 1)][:ht, :wd].reshape(-1, 3)

        # cam → world with the newest keyframe pose (w2c stored)
        from . import geometry

        mats_w2c = geometry.se3_to_matrix(poses_w2c)
        m = np.linalg.inv(mats_w2c[n - 1])
        pts_w = pts_cam @ m[:3, :3].T + m[:3, 3]
        keep = (disp.reshape(-1) > 1e-3) & np.isfinite(pts_w).all(-1)

        tmp = self.snapshot_path.with_name(self.snapshot_path.name + ".tmp")
        with open(tmp, "wb") as f:  # file handle: savez won't append ".npz"
            np.savez(
                f,
                n_keyframes=np.int64(n),
                tstamp=np.asarray(buffer.tstamp[:n]),
                poses_w2c=poses_w2c,
                cloud_xyz=pts_w[keep].astype(np.float32),
                cloud_rgb=cols[keep],
                wall_time=np.float64(time.time()),
            )
        os.replace(tmp, self.snapshot_path)
        return True


def read_snapshot(path) -> dict:
    """Load a telemetry snapshot written by TelemetryWriter."""
    with np.load(path) as z:
        return {k: z[k] for k in z.files}
