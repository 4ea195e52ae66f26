"""Sparse keypoint tracks interface (reference
/root/reference/vipe/slam/components/sparse_tracks/__init__.py:16-160).

``SparseTracks`` maintains per-(view, frame) keypoint observations and can
splat keypoint flows onto the 1/8 SLAM grid as extra BA targets
(``compute_dense_disp_target_weight``, reference :73-135).  The default
backend is ``DummySparseTracks`` (disabled, configs/slam/default.yaml:51-56);
``CuVSLAMSparseTracks`` wraps NVIDIA's proprietary ``vslam`` wheel in the
reference and has no TPU counterpart — an external tracker can implement the
same interface and plug in via the ``name`` config.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


class SparseTracks:
    enabled: bool = True

    def __init__(self, n_views: int = 1):
        self.n_views = n_views
        # view → keypoint id → frame → (u, v) at full resolution
        self.observations: List[Dict[int, Dict[int, np.ndarray]]] = [
            {} for _ in range(n_views)
        ]

    # ------------------------------------------------------------- tracking

    def track_image(self, frame_idx: int, frames: Sequence) -> None:
        """Ingest one frame per view (called by SLAMSystem pass 1,
        reference system.py:255)."""
        raise NotImplementedError

    def add_observation(self, view_idx: int, kp_id: int, frame_idx: int,
                        uv) -> None:
        self.observations[view_idx].setdefault(kp_id, {})[frame_idx] = (
            np.asarray(uv, np.float32)
        )

    # --------------------------------------------------------------- queries

    def get_correspondences(self, view_idx: int, frame_i: int,
                            frame_j: int) -> List[int]:
        """Keypoint ids observed in BOTH frames of a view (reference :40-55)."""
        return [
            k for k, obs in self.observations[view_idx].items()
            if frame_i in obs and frame_j in obs
        ]

    def get_observations(self, view_idx: int, frame_idx: int,
                         kp_ids: List[int]) -> np.ndarray:
        obs = self.observations[view_idx]
        return np.stack(
            [obs[k][frame_idx] for k in kp_ids]
        ) if kp_ids else np.zeros((0, 2), np.float32)

    def n_tracks(self, view_idx: int, frame_idx: int) -> int:
        return sum(
            1 for obs in self.observations[view_idx].values()
            if frame_idx in obs
        )

    # ---------------------------------------------------------- BA coupling

    def compute_dense_disp_target_weight(
        self,
        source_view_inds: np.ndarray,
        source_frame_inds: np.ndarray,
        target_view_inds: np.ndarray,
        target_frame_inds: np.ndarray,
        image_size: Tuple[int, int],
        dense_disp_size: Tuple[int, int],
        weight: float = 1.0,
    ):
        """Splat keypoint correspondences onto the 1/8 grid as extra BA flow
        targets (reference :73-135): for each edge and each keypoint observed
        in both frames, the grid cell containing the source observation gets
        target = the target-frame observation (scaled to grid coords) and a
        positive weight; all other cells get weight 0.  Same-view edges only
        (the reference notes cross-view tracking is unsupported).
        """
        H, W = image_size
        ht, wd = dense_disp_size
        E = len(source_frame_inds)
        target = np.zeros((E, ht, wd, 2), np.float32)
        wgt = np.zeros((E, ht, wd, 2), np.float32)
        sx, sy = wd / W, ht / H
        for e in range(E):
            qi, qj = int(source_view_inds[e]), int(target_view_inds[e])
            if qi != qj:
                continue
            fi, fj = int(source_frame_inds[e]), int(target_frame_inds[e])
            kps = self.get_correspondences(qi, fi, fj)
            if not kps:
                continue
            src = self.get_observations(qi, fi, kps)
            dst = self.get_observations(qj, fj, kps)
            gu = np.clip((src[:, 0] * sx).astype(int), 0, wd - 1)
            gv = np.clip((src[:, 1] * sy).astype(int), 0, ht - 1)
            target[e, gv, gu, 0] = dst[:, 0] * sx
            target[e, gv, gu, 1] = dst[:, 1] * sy
            wgt[e, gv, gu] = weight
        return target, wgt


class DummySparseTracks(SparseTracks):
    """Disabled backend (reference :139-143) — the default."""

    enabled = False

    def track_image(self, frame_idx: int, frames) -> None:
        pass


def build_sparse_tracks(config: Optional[dict] = None,
                        n_views: int = 1) -> SparseTracks:
    """Factory (reference sparse_tracks/__init__.py:148-158)."""
    name = (config or {}).get("name", "dummy")
    if name == "dummy":
        return DummySparseTracks(n_views)
    if name == "instance":
        # dotted-path custom tracker: instance=module.Class
        import importlib

        path = config["instance"]
        module, cls = path.rsplit(".", 1)
        klass = getattr(importlib.import_module(module), cls)
        kwargs = {k: v for k, v in config.items()
                  if k not in ("name", "instance")}
        return klass(n_views=n_views, **kwargs)
    raise ValueError(
        f"unknown sparse tracks backend {name!r} (cuvslam is NVIDIA-"
        "proprietary and has no TPU build; implement SparseTracks to plug "
        "in an external tracker)"
    )
