"""Artifact I/O — on-disk layout parity with the reference
(/root/reference/vipe/utils/io.py:41-378).

Layout under an output root, per video ``<name>``:
  rgb/<name>.mp4                processed RGB video (mp4v here; h264 there)
  pose/<name>.npz               {"data": (T, 4, 4) c2w matrices, "inds": (T,)}
  intrinsics/<name>.npz         {"data": (T, D)} + intrinsics/<name>_camera.txt
  depth/<name>.zip              per-frame float16 EXR "Z"-channel entries
                                "%05d.exr" (reference io.py:250-276 format,
                                via the pure-Python codec in utils/exr.py —
                                the reference's OpenEXR-based
                                read_depth_artifacts parses these); legacy
                                "%05d.npy" entries still readable
  mask/<name>.zip               per-frame PNG instance masks + mask/<name>.txt
  vipe/<name>_info.pkl          misc info (ba_residual, …)
  vipe/<name>_vis.mp4           visualization video
"""

from __future__ import annotations

import dataclasses
import io as _io
import pathlib
import pickle
import zipfile
from typing import Iterator, List, Optional

import numpy as np


@dataclasses.dataclass
class ArtifactPath:
    root: pathlib.Path
    name: str

    def __post_init__(self):
        self.root = pathlib.Path(self.root)

    @property
    def rgb_path(self):
        return self.root / "rgb" / f"{self.name}.mp4"

    @property
    def pose_path(self):
        return self.root / "pose" / f"{self.name}.npz"

    @property
    def intrinsics_path(self):
        return self.root / "intrinsics" / f"{self.name}.npz"

    @property
    def camera_type_path(self):
        return self.root / "intrinsics" / f"{self.name}_camera.txt"

    @property
    def depth_path(self):
        return self.root / "depth" / f"{self.name}.zip"

    @property
    def mask_path(self):
        return self.root / "mask" / f"{self.name}.zip"

    @property
    def mask_phrase_path(self):
        return self.root / "mask" / f"{self.name}.txt"

    @property
    def info_path(self):
        return self.root / "vipe" / f"{self.name}_info.pkl"

    @property
    def vis_path(self):
        return self.root / "vipe" / f"{self.name}_vis.mp4"

    # Layout parity with the reference's extended artifact set (reference
    # io.py:67-143): flow archives plus eval/aux paths consumed by external
    # benchmark tooling.  Nothing in-tree writes these yet (same as the
    # reference, where they have no in-repo producer either).
    @property
    def flow_path(self):
        return self.root / "flow" / f"{self.name}.zip"

    @property
    def eval_metrics_path(self):
        return self.root / "eval" / f"{self.name}_metrics.pkl"

    @property
    def eval_traj_vis_path(self):
        return self.root / "eval" / f"{self.name}_trajectory_vis.png"

    @property
    def eval_gt_pose_path(self):
        return self.root / "eval" / f"{self.name}_pose_gt.npz"

    @property
    def eval_gt_intrinsics_path(self):
        return self.root / "eval" / f"{self.name}_intrinsics_gt.npz"

    @property
    def eval_gt_camera_type_path(self):
        return self.root / "eval" / f"{self.name}_camera_gt.txt"

    @property
    def eval_gt_depth_path(self):
        return self.root / "eval" / f"{self.name}_depth_gt.zip"

    @property
    def aux_vis_plot_path(self):
        return self.root / "vipe_aux_vis" / f"{self.name}_plot.png"

    @property
    def aux_vis_traj_path(self):
        return self.root / "vipe_aux_vis" / f"{self.name}_traj.mp4"

    def exists(self) -> bool:
        return self.pose_path.exists()

    @staticmethod
    def glob(root) -> List["ArtifactPath"]:
        root = pathlib.Path(root)
        out = []
        for p in sorted((root / "pose").glob("*.npz")):
            out.append(ArtifactPath(root, p.stem))
        return out


# ------------------------------------------------------------------ writers


def save_poses(path: ArtifactPath, trajectory_c2w: np.ndarray, inds=None):
    """trajectory: (T, 7) SE3 or (T, 4, 4) matrices."""
    from .geometry import se3_to_matrix

    path.pose_path.parent.mkdir(parents=True, exist_ok=True)
    mats = (
        trajectory_c2w
        if trajectory_c2w.ndim == 3
        else se3_to_matrix(trajectory_c2w)
    )
    if inds is None:
        inds = np.arange(len(mats))
    np.savez(path.pose_path, data=mats.astype(np.float32), inds=np.asarray(inds))


def save_intrinsics(path: ArtifactPath, intrinsics: np.ndarray, camera_type: str,
                    n_frames: Optional[int] = None):
    path.intrinsics_path.parent.mkdir(parents=True, exist_ok=True)
    intr = np.asarray(intrinsics, np.float32)
    if intr.ndim == 1 and n_frames is not None:
        intr = np.broadcast_to(intr, (n_frames,) + intr.shape)
    np.savez(path.intrinsics_path, data=intr)
    path.camera_type_path.write_text(str(camera_type))


def save_depth_zip(path: ArtifactPath, depths: Iterator[np.ndarray]):
    w = StreamingArtifactWriter(path, write_rgb=False, write_mask=False)
    for d in depths:
        w.add_frame(depth=d)
    w.close()


def save_mask_zip(path: ArtifactPath, masks: Iterator[np.ndarray],
                  phrases=None):
    w = StreamingArtifactWriter(path, write_rgb=False, write_depth=False)
    for m in masks:
        w.add_frame(instance=m)
    w.close(phrases=phrases)


def save_rgb_video(path: ArtifactPath, frames: Iterator[np.ndarray], fps: float = 30.0):
    """frames: (H, W, 3) float [0,1] or uint8 RGB."""
    w = StreamingArtifactWriter(
        path, fps=fps, write_depth=False, write_mask=False
    )
    for f in frames:
        w.add_frame(rgb=f)
    w.close()


def save_info(path: ArtifactPath, info: dict):
    path.info_path.parent.mkdir(parents=True, exist_ok=True)
    with open(path.info_path, "wb") as f:
        pickle.dump(info, f)


def _open_video_writer(path: str, fps: float, size):
    """h264 (avc1) when the local cv2/ffmpeg build supports it — the
    reference encodes rgb artifacts with libx264 (visualization.py:47-80) —
    falling back to mp4v otherwise (this image's ffmpeg has no libx264)."""
    import cv2

    quiet = getattr(getattr(cv2, "utils", None), "logging", None)
    prev = quiet.getLogLevel() if quiet else None
    try:
        if quiet:
            quiet.setLogLevel(cv2.utils.logging.LOG_LEVEL_SILENT)
        for fourcc in ("avc1", "mp4v"):
            w = cv2.VideoWriter(
                path, cv2.VideoWriter_fourcc(*fourcc), fps, size
            )
            if w.isOpened():
                return w
            w.release()
    finally:
        if quiet:
            quiet.setLogLevel(prev)
    raise RuntimeError(f"no usable mp4 encoder for {path}")


class StreamingArtifactWriter:
    """Incremental per-frame artifact writer: rgb video, depth zip and mask
    zip entries are written as frames arrive, so a pipeline pass never holds
    more than one frame in memory (the reference streams artifacts through
    lazy iterators the same way, io.py:338-378).

    Zip archives stay DENSE: once any depth/mask entry has been written,
    every frame index gets an entry (NaN depth / zero mask fill-ins for
    frames where the attribute was absent, including backfill of earlier
    frames when the first value arrives mid-stream), so positional readers
    that zip entries with the rgb video stay aligned."""

    def __init__(self, path: ArtifactPath, fps: float = 30.0,
                 write_rgb: bool = True, write_depth: bool = True,
                 write_mask: bool = True):
        self.path = path
        self.fps = fps
        self.write_rgb = write_rgb
        self.write_depth = write_depth
        self.write_mask = write_mask
        self._rgb_writer = None
        self._depth_zip = None
        self._mask_zip = None
        self._depth_shape = None
        self._mask_shape = None
        self.n_frames = 0
        self.wrote_depth = False
        self.wrote_mask = False

    def _put_depth(self, i: int, depth):
        from .exr import encode_exr

        self._depth_zip.writestr(f"{i:05d}.exr", encode_exr(depth))

    def _put_mask(self, i: int, mask):
        import cv2

        ok, png = cv2.imencode(".png", np.asarray(mask, np.uint8))
        assert ok
        self._mask_zip.writestr(f"{i:05d}.png", png.tobytes())

    def add_frame(self, rgb=None, depth=None, instance=None):
        import cv2

        i = self.n_frames
        if rgb is not None and self.write_rgb:
            f = np.asarray(rgb)
            if f.dtype != np.uint8:
                f = (np.clip(f, 0, 1) * 255).astype(np.uint8)
            if self._rgb_writer is None:
                self.path.rgb_path.parent.mkdir(parents=True, exist_ok=True)
                h, w = f.shape[:2]
                self._rgb_writer = _open_video_writer(
                    str(self.path.rgb_path), self.fps, (w, h)
                )
            self._rgb_writer.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        if self.write_depth and (depth is not None or self._depth_zip is not None):
            if depth is not None and self._depth_zip is None:
                self.path.depth_path.parent.mkdir(parents=True, exist_ok=True)
                self._depth_zip = zipfile.ZipFile(
                    self.path.depth_path, "w", zipfile.ZIP_DEFLATED
                )
                fill = np.full(np.asarray(depth).shape, np.nan, np.float16)
                for k in range(i):  # backfill frames seen before first depth
                    self._put_depth(k, fill)
            if depth is None:
                depth = np.full(self._depth_shape, np.nan, np.float16)
            self._depth_shape = np.asarray(depth).shape
            self._put_depth(i, depth)
            self.wrote_depth = True
        if self.write_mask and (instance is not None or self._mask_zip is not None):
            if instance is not None and self._mask_zip is None:
                self.path.mask_path.parent.mkdir(parents=True, exist_ok=True)
                self._mask_zip = zipfile.ZipFile(
                    self.path.mask_path, "w", zipfile.ZIP_DEFLATED
                )
                fill = np.zeros(np.asarray(instance).shape, np.uint8)
                for k in range(i):
                    self._put_mask(k, fill)
            if instance is None:
                instance = np.zeros(self._mask_shape, np.uint8)
            self._mask_shape = np.asarray(instance).shape
            self._put_mask(i, instance)
            self.wrote_mask = True
        self.n_frames += 1

    def close(self, phrases: Optional[List[str]] = None):
        if self._rgb_writer is not None:
            self._rgb_writer.release()
        if self._depth_zip is not None:
            self._depth_zip.close()
        if self._mask_zip is not None:
            self._mask_zip.close()
            if phrases is not None:
                if isinstance(phrases, dict):
                    # "idx: phrase" mapping lines (reference io.py:361-377
                    # save / read_instance_phrases:326-335)
                    text = "\n".join(
                        f"{int(k)}: {v}" for k, v in sorted(phrases.items())
                    )
                else:
                    text = "\n".join(phrases)
                self.path.mask_phrase_path.write_text(text)

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


# ------------------------------------------------------------------ readers


def read_pose_artifacts(path: ArtifactPath):
    """Returns (mats (T,4,4), inds (T,))."""
    z = np.load(path.pose_path)
    return z["data"], z.get("inds", np.arange(len(z["data"])))


def read_intrinsics_artifacts(path: ArtifactPath):
    z = np.load(path.intrinsics_path)
    camera_type = (
        path.camera_type_path.read_text().strip()
        if path.camera_type_path.exists() else "pinhole"
    )
    return z["data"], camera_type


def read_depth_artifacts(path: ArtifactPath) -> Iterator[np.ndarray]:
    yield from read_depth_zip(path.depth_path)


def read_depth_zip(zip_path) -> Iterator[np.ndarray]:
    with zipfile.ZipFile(zip_path) as zf:
        for name in sorted(zf.namelist()):
            data = zf.read(name)
            if name.endswith(".npy"):  # legacy archives from earlier rounds
                yield np.load(_io.BytesIO(data)).astype(np.float32)
            elif name.endswith(".exr"):
                from .exr import decode_exr

                try:
                    yield decode_exr(data)
                except Exception:
                    # corrupt entry → NaN map, matching the reference's
                    # loader fallback (io.py:287-301)
                    yield np.full((1, 1), np.nan, np.float32)


def read_mask_artifacts(path: ArtifactPath) -> Iterator[np.ndarray]:
    import cv2

    with zipfile.ZipFile(path.mask_path) as zf:
        for name in sorted(zf.namelist()):
            arr = cv2.imdecode(
                np.frombuffer(zf.read(name), np.uint8), cv2.IMREAD_UNCHANGED
            )
            yield np.asarray(arr)


def read_instance_phrases(path: ArtifactPath) -> dict:
    """Parse the ``idx: phrase`` mapping written alongside the mask zip
    (reference io.py:326-335).  Plain phrase-list files (no ``:``) return
    ``{}`` — callers fall back to positional semantics."""
    out: dict = {}
    if not path.mask_phrase_path.exists():
        return out
    for line in path.mask_phrase_path.read_text().splitlines():
        if ":" not in line:
            return {}
        idx, phrase = line.split(":", 1)
        out[int(idx)] = phrase.strip()
    return out


def read_info(path: ArtifactPath) -> dict:
    with open(path.info_path, "rb") as f:
        return pickle.load(f)


def save_artifacts(path: ArtifactPath, output) -> None:
    """Save a full AnnotationPipelineOutput (see vipe_tpu.pipeline)."""
    if output.trajectory is not None:
        save_poses(path, output.trajectory, output.frame_inds)
    if output.intrinsics is not None:
        save_intrinsics(
            path, output.intrinsics, output.camera_type,
            n_frames=(len(output.trajectory) if output.trajectory is not None else None),
        )
    if output.depths is not None:
        save_depth_zip(path, output.depths)
    if output.instance_masks is not None:
        save_mask_zip(path, output.instance_masks, output.mask_phrases)
    if output.rgb_frames is not None:
        save_rgb_video(path, output.rgb_frames, output.fps)
    save_info(path, {"ba_residual": output.ba_residual})
