"""TrackAnything: open-vocabulary instance segmentation + tracking.

Reference: /root/reference/vipe/priors/track_anything/ — frame 0 (and every
``sam_gap`` frames) runs GroundingDINO text-prompt detection + SAM box
segmentation, merging newly found objects; DeAOT propagates masks in between
(__init__.py:82-123, seg_tracker.py:83-111).

All three stages are ported TPU-native: SAM (.sam), GroundingDINO (.gdino)
and the DeAOT mask propagator (.deaot); ``use_tracker=False`` falls back to
holding the last instance map between detections.
"""

from __future__ import annotations

from typing import Callable, List, Optional

import numpy as np

from .sam import SamPredictor  # noqa: F401


class SegTracker:
    """Detection + segmentation + propagation state machine
    (reference seg_tracker.py:83-111)."""

    def __init__(self, detector, segmentor: SamPredictor, tracker,
                 sam_gap: int = 20, max_obj_num: int = 255,
                 min_area: int = 200):
        self.detector = detector
        self.segmentor = segmentor
        self.tracker = tracker
        self.sam_gap = sam_gap
        self.max_obj_num = max_obj_num
        self.min_area = min_area
        self.curr_idx = 0  # next object id

    def detect_and_seg(self, rgb: np.ndarray, phrases: List[str]):
        """Detect phrase boxes, segment each, compose an instance map.

        Returns ``(instance, id2phrase)`` — the per-object phrase mapping
        mirrors the reference's ``pred_phrase`` dict (seg_tracker.py detect
        path), which downstream drives ``VideoFrame.sky_mask``."""
        boxes, names = self.detector.run_grounding(
            rgb, phrases, return_phrases=True
        )
        self.segmentor.set_image(rgb)
        # ONE batched decoder pass for all boxes and ONE on-device
        # first-wins composition (segment_composite) — the reference's
        # per-box loop costs 2 dispatches + 2 readbacks per box, and even
        # batched per-box mask readbacks are ~120 MB per detection frame;
        # this path reads back B areas + one int32 map
        instance, ids = self.segmentor.segment_composite(
            boxes, self.min_area, self.curr_idx + 1
        )
        id2phrase: dict = {}
        for oid, name in zip(ids, names):
            if oid > 0:
                id2phrase[int(oid)] = name
                self.curr_idx = max(self.curr_idx, int(oid))
        return instance, id2phrase

    def merge_new_objects(self, instance: np.ndarray, tracked: np.ndarray,
                          min_new_obj_iou: float = 0.8) -> np.ndarray:
        """Keep tracked ids; add a detection only if ≥ ``min_new_obj_iou`` of
        its area lies on untracked background and it clears ``min_area``
        (reference seg_tracker.find_new_objs:82-110).  If the combined new
        area exceeds 40% of the frame, discard all new objects (reference
        __init__.py:105-108 detection-glitch guard)."""
        new_mask = np.where(tracked == 0, instance, 0)
        out = tracked.copy()
        # per-object area ratios via bincount (one pass over the frame
        # instead of a full-res boolean pass per object id)
        n_ids = int(max(new_mask.max(), instance.max())) + 1
        new_areas = np.bincount(new_mask.ravel(), minlength=n_ids)
        obj_areas = np.bincount(instance.ravel(), minlength=n_ids)
        ok = (
            (new_areas / np.maximum(obj_areas, 1) >= min_new_obj_iou)
            & (new_areas >= self.min_area)
        )
        ok[0] = False
        added = ok[new_mask]
        if added.sum() > 0.4 * tracked.size:
            return out
        out[added] = new_mask[added]
        return out


class TrackAnythingPipeline:
    """Per-frame instance masks for a phrase list (reference __init__.py:16-123)."""

    def __init__(self, phrases: List[str], sam_gap: int = 20,
                 detector=None, tracker=None, sam_variant: str = "vit_b",
                 sam_params=None, box_threshold: float = 0.35,
                 use_tracker: bool = True):
        if detector is None:
            from .gdino import GroundingDINODetector

            detector = GroundingDINODetector(box_threshold=box_threshold)
        if tracker is None and use_tracker:
            from .deaot import DeAOTTracker

            tracker = DeAOTTracker()
        # "sky" is detected like any other phrase (reference processors.py:
        # 123-124 appends SKY_PROMPT); its ids flow into instance_phrases so
        # VideoFrame.sky_mask can keep sky unmasked for SLAM and excluded
        # from depth alignment.
        self.phrases = list(phrases)
        segmentor = SamPredictor(sam_variant, params=sam_params)
        self.seg_tracker = SegTracker(detector, segmentor, tracker, sam_gap)
        self.sam_gap = sam_gap
        self.tracker = tracker
        self._frame_count = 0
        self._last_instance: Optional[np.ndarray] = None
        self.instance_phrase: dict = {}

    def reset(self):
        """Clear per-video state (frame counter, id↔phrase maps, tracker
        memory) so a process-cached pipeline instance can serve the next
        video with fresh semantics (models/model_cache.py)."""
        self._frame_count = 0
        self._last_instance = None
        self.instance_phrase = {}
        self.seg_tracker.curr_idx = 0
        if self.tracker is not None:
            self.tracker.restart()

    def track(self, frame_idx: int, rgb: np.ndarray):
        """Returns ``(instance, instance_phrases)`` (reference
        __init__.py:82-123): (H, W) int32 ids (0 = background / static
        scene) plus the id→phrase mapping for the ids present."""
        from ...utils import profiling

        rgb = np.asarray(rgb)
        if self._frame_count % self.sam_gap == 0:
            with profiling.stage("ta_detect"):
                detected, id2phrase = self.seg_tracker.detect_and_seg(
                    rgb, self.phrases
                )
                self.instance_phrase.update(id2phrase)
                if self._last_instance is None or self.tracker is None:
                    instance = detected
                else:
                    # detection frames track WITHOUT a memory update
                    # (reference __init__.py:102-111 + seg_tracker.track)
                    tracked = self.tracker.propagate(
                        rgb, update_memory=False
                    )
                    instance = self.seg_tracker.merge_new_objects(
                        detected, tracked
                    )
                if self.tracker is not None:
                    self.tracker.add_reference(rgb, instance)
        else:
            if self.tracker is None:
                instance = (
                    self._last_instance
                    if self._last_instance is not None
                    else np.zeros(rgb.shape[:2], np.int32)
                )
            else:
                instance = self.tracker.propagate(rgb)
        self._last_instance = instance
        self._frame_count += 1
        present = {
            int(k): self.instance_phrase.get(int(k), "")
            for k in np.unique(instance) if k != 0
        }
        return instance, present
