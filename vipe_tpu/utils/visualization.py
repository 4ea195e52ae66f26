"""Visualization: colorized panes + projection video (reference
/root/reference/vipe/utils/visualization.py:47-491)."""

from __future__ import annotations

import numpy as np

# fixed instance palette (reference visualization.py:36-37 uses a palette too)
_PALETTE = np.asarray(
    [
        [0, 0, 0],
        [230, 25, 75], [60, 180, 75], [255, 225, 25], [0, 130, 200],
        [245, 130, 48], [145, 30, 180], [70, 240, 240], [240, 50, 230],
        [210, 245, 60], [250, 190, 190], [0, 128, 128], [230, 190, 255],
        [170, 110, 40], [255, 250, 200], [128, 0, 0], [170, 255, 195],
    ],
    np.uint8,
)


def colorize_instance(instance: np.ndarray) -> np.ndarray:
    return _PALETTE[np.asarray(instance) % len(_PALETTE)]


def colorize_inv_depth(depth: np.ndarray, q_lo=0.02, q_hi=0.98) -> np.ndarray:
    """Inverse-depth turbo-ish colormap (reference :312-348)."""
    import matplotlib

    d = np.asarray(depth, np.float32)
    inv = np.where(d > 0, 1.0 / np.maximum(d, 1e-6), 0.0)
    valid = inv > 0
    if valid.any():
        lo, hi = np.quantile(inv[valid], [q_lo, q_hi])
        inv = np.clip((inv - lo) / max(hi - lo, 1e-6), 0, 1)
    rgba = matplotlib.colormaps["turbo"](inv)
    out = (rgba[..., :3] * 255).astype(np.uint8)
    out[~valid] = 0
    return out


class VideoWriter:
    """mp4 writer (reference :47-80; mp4v fourcc since h264 encoders are not
    present in this image)."""

    def __init__(self, path, fps: float = 30.0):
        self.path = str(path)
        self.fps = fps
        self._writer = None

    def write(self, frame_rgb: np.ndarray):
        import cv2

        f = np.asarray(frame_rgb)
        if f.dtype != np.uint8:
            f = (np.clip(f, 0, 1) * 255).astype(np.uint8)
        if self._writer is None:
            h, w = f.shape[:2]
            import pathlib

            pathlib.Path(self.path).parent.mkdir(parents=True, exist_ok=True)
            self._writer = cv2.VideoWriter(
                self.path, cv2.VideoWriter_fourcc(*"mp4v"), self.fps, (w, h)
            )
        self._writer.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))

    def close(self):
        if self._writer is not None:
            self._writer.release()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def rectify_rgb(rgb8: np.ndarray, intrinsics, camera_type) -> np.ndarray:
    """Undistorted (pinhole-equivalent) view of a frame (reference
    save_projection_video 'rectified' pane, visualization.py:380-405):
    unproject the pinhole grid at unit disparity, project the rays through
    the ORIGINAL camera model, bilinearly sample.  Identity for pinhole."""
    import cv2
    import jax.numpy as jnp

    from ..ops import cameras as cam
    from ..ops.cameras import CameraType

    ct = CameraType(camera_type) if isinstance(camera_type, str) else camera_type
    if ct == CameraType.PINHOLE:
        return rgb8
    h, w = rgb8.shape[:2]
    intr = jnp.asarray(np.asarray(intrinsics, np.float32).reshape(-1))
    pin = cam.pinhole_equivalent(ct, intr)
    u, v = np.meshgrid(
        np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32)
    )
    pts = cam.iproj_disp(
        CameraType.PINHOLE, pin, jnp.asarray(u), jnp.asarray(v),
        jnp.ones((h, w), jnp.float32),
    )
    coords = np.asarray(cam.proj_points(ct, intr, pts), np.float32)
    return cv2.remap(
        rgb8, coords[..., 0], coords[..., 1], cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT,
    )


def render_projection_frame(frame, k, slam_output,
                            attributes=("rgb", "depth")) -> np.ndarray:
    """One visualization frame: horizontal grid of panes (reference
    save_projection_video inner loop, :289-491).  Panes: rgb, instance,
    depth (colorized inv-depth), pcd (SLAM map projected + alpha-blended)."""
    import jax.numpy as jnp

    from ..ops import lie

    panes = []
    h, w = frame.size()
    rgb8 = (np.clip(frame.rgb, 0, 1) * 255).astype(np.uint8)
    for attr in attributes:
        if attr == "rgb":
            panes.append(rgb8)
        elif attr == "depth" and frame.metric_depth is not None:
            panes.append(colorize_inv_depth(frame.metric_depth))
        elif attr == "instance" and frame.instance is not None:
            panes.append(colorize_instance(frame.instance))
        elif attr == "rectified" and frame.intrinsics is not None:
            panes.append(rectify_rgb(
                rgb8, frame.intrinsics, slam_output.camera_type
            ))
        elif attr == "pcd" and slam_output.slam_map is not None:
            w2c = np.asarray(lie.se3_inv(
                jnp.asarray(slam_output.trajectory[k], np.float32)))
            depth = slam_output.slam_map.project_map(
                w2c, slam_output.intrinsics, slam_output.camera_type,
                (h, w), frame_idx=k,
            )
            pcd_pane = colorize_inv_depth(depth)
            blend = (0.5 * rgb8 + 0.5 * pcd_pane).astype(np.uint8)
            panes.append(blend)
    if not panes:
        panes = [rgb8]
    return np.concatenate(panes, axis=1)


def save_projection_video(artifact_path, frames, slam_output,
                          attributes=("rgb", "depth"), fps: float = 30.0):
    """Grid-of-panes video over an iterable of frames (single pass)."""
    with VideoWriter(artifact_path.vis_path, fps) as vw:
        for k, frame in enumerate(frames):
            vw.write(render_projection_frame(frame, k, slam_output, attributes))
