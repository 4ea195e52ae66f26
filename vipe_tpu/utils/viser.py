"""Artifact viewer (reference /root/reference/vipe/utils/viser.py:399-448).

``run_viser`` serves the saved artifact directory with a native viser app
(camera frustums + per-frame backprojected point clouds + a playback
slider, the reference's viewer semantics) when the ``viser`` package is
importable, degrading to a static matplotlib diagnostic PNG otherwise
(this image has no viser).  The zero-dependency interactive WebGL viewer
(``utils/web_viewer.py``) covers the same artifacts via
``vipe visualize --serve``.
"""

from __future__ import annotations

import pathlib

import numpy as np

from . import io as io_utils


def load_scene(artifact_dir):
    """Parse one artifact dir into (art, poses, inds, intrinsics, cam type)."""
    arts = io_utils.ArtifactPath.glob(artifact_dir)
    if not arts:
        raise FileNotFoundError(f"no artifacts under {artifact_dir}")
    art = arts[0]
    mats, inds = io_utils.read_pose_artifacts(art)
    intr, camera_type = io_utils.read_intrinsics_artifacts(art)
    return art, mats, inds, intr, camera_type


def _backproject(depth: np.ndarray, intr, mat, stride: int = 4):
    h, w = depth.shape[:2]
    ys, xs = np.mgrid[0:h:stride, 0:w:stride]
    d = depth[ys, xs]
    ok = np.isfinite(d) & (d > 0)
    fx, fy, cx, cy = np.asarray(intr, np.float32).reshape(-1)[:4]
    x = (xs[ok] - cx) / fx * d[ok]
    y = (ys[ok] - cy) / fy * d[ok]
    pts = np.stack([x, y, d[ok]], -1)
    return pts @ mat[:3, :3].T + mat[:3, 3]


def _run_viser_app(artifact_dir, port: int):
    import time

    import viser

    art, mats, inds, intr, camera_type = load_scene(artifact_dir)
    intr = np.asarray(intr, np.float32)
    if intr.ndim == 1:
        intr = np.broadcast_to(intr, (len(mats),) + intr.shape)
    depths = (
        list(io_utils.read_depth_artifacts(art))
        if art.depth_path.exists() else None
    )

    server = viser.ViserServer(port=port)
    frustums = []
    for k, mat in enumerate(mats):
        fx, fy, cx, cy = intr[k][:4]
        wxyz = _mat_to_wxyz(mat[:3, :3])
        fr = server.scene.add_camera_frustum(
            f"/frames/f{k:05d}/frustum",
            fov=2.0 * float(np.arctan2(cy, fy)),
            aspect=float(cx / cy) if cy else 1.0,
            scale=0.05,
            wxyz=wxyz,
            position=mat[:3, 3],
        )
        frustums.append(fr)
        if depths is not None and k < len(depths):
            pts = _backproject(depths[k], intr[k], mat, stride=6)
            if len(pts):
                server.scene.add_point_cloud(
                    f"/frames/f{k:05d}/pcd", points=pts.astype(np.float32),
                    colors=np.full((len(pts), 3), 180, np.uint8),
                    point_size=0.01,
                )
    slider = server.gui.add_slider(
        "frame", min=0, max=len(mats) - 1, step=1, initial_value=0
    )

    @slider.on_update
    def _(_):
        k = int(slider.value)
        for i, fr in enumerate(frustums):
            fr.visible = i <= k

    print(f"[viser] serving {art.name} on port {port} (ctrl-c to stop)")
    while True:
        time.sleep(1.0)


def _mat_to_wxyz(R: np.ndarray) -> np.ndarray:
    """Rotation matrix → wxyz quaternion (Shepperd's method)."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return np.array([0.25 * s, (R[2, 1] - R[1, 2]) / s,
                         (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s])
    i = int(np.argmax(np.diag(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(max(1.0 + R[i, i] - R[j, j] - R[k, k], 1e-12)) * 2
    q = np.empty(4)
    q[0] = (R[k, j] - R[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (R[j, i] + R[i, j]) / s
    q[1 + k] = (R[k, i] + R[i, k]) / s
    return q


def run_viser(artifact_dir, port: int = 8080):
    """Native viser app when the package is importable (the reference's
    interactive viewer); otherwise a static trajectory diagnostic PNG.
    The interactive zero-dependency WebGL viewer is always available via
    ``vipe visualize --serve`` (utils/web_viewer.py)."""
    try:
        import viser  # noqa: F401

        has_viser = True
    except ImportError:
        has_viser = False

    if has_viser:
        try:
            return _run_viser_app(artifact_dir, port)
        except KeyboardInterrupt:
            return None
        except Exception as e:  # degrade, never crash the entry point
            print(f"[viser] native app failed ({e!r}); "
                  "writing static diagnostic instead "
                  "(interactive alternative: vipe visualize --serve)")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    art, mats, inds, intr, camera_type = load_scene(artifact_dir)
    pos = mats[:, :3, 3]
    fig = plt.figure(figsize=(12, 5))
    ax = fig.add_subplot(121, projection="3d")
    ax.plot(pos[:, 0], pos[:, 1], pos[:, 2], "-o", markersize=2)
    ax.set_title(f"{art.name} trajectory ({len(pos)} frames)")
    ax2 = fig.add_subplot(122)
    ax2.plot(inds, pos)
    ax2.legend(["x", "y", "z"])
    ax2.set_title("position vs frame")
    out = pathlib.Path(artifact_dir) / f"{art.name}_viser_fallback.png"
    fig.savefig(out, dpi=110)
    print(f"[viser-fallback] wrote {out}")
    return out
