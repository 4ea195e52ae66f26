"""SAM (flax) + TrackAnything glue tests (reduced image size for CPU)."""

import numpy as np
import pytest

from vipe_tpu.priors.track_anything import SegTracker, TrackAnythingPipeline
from vipe_tpu.priors.track_anything.sam import SamPredictor


@pytest.fixture(scope="module")
def predictor():
    return SamPredictor("vit_b", img_size=128)


class TestSam:
    def test_embed_and_segment(self, predictor, rng):
        predictor.set_image(rng.random((96, 128, 3)).astype(np.float32))
        m = predictor.segment_with_box([20, 15, 90, 70])
        assert m.shape == (96, 128) and m.dtype == bool

    def test_different_boxes_differ(self, predictor, rng):
        predictor.set_image(rng.random((96, 128, 3)).astype(np.float32))
        m1 = predictor.segment_with_box([5, 5, 40, 40])
        m2 = predictor.segment_with_box([60, 50, 120, 90])
        assert (m1 != m2).mean() > 0.01

    def test_image_resolution_independent_params(self, predictor, rng):
        """Non-square inputs resize+pad to the model square."""
        predictor.set_image(rng.random((50, 120, 3)).astype(np.float32))
        m = predictor.segment_with_box([10, 10, 100, 40])
        assert m.shape == (50, 120)


class _FakeDetector:
    def run_grounding(self, rgb, phrases):
        h, w = rgb.shape[:2]
        return [[w * 0.1, h * 0.1, w * 0.5, h * 0.6]]


class TestTrackAnything:
    def test_default_detector_is_gdino(self):
        from vipe_tpu.priors.track_anything.gdino import GroundingDINODetector

        pipe = TrackAnythingPipeline(["person"])
        assert isinstance(pipe.seg_tracker.detector, GroundingDINODetector)

    def test_pipeline_with_fake_detector(self, rng):
        # use_tracker=False exercises the hold-last-instance fallback;
        # the DeAOT propagation path is covered in test_deaot.py
        pipe = TrackAnythingPipeline(
            ["person", "sky"], detector=_FakeDetector(), sam_gap=2,
            use_tracker=False,
        )
        # shrink SAM for the test
        pipe.seg_tracker.segmentor = SamPredictor("vit_b", img_size=128)
        m0 = pipe.track(0, rng.random((64, 96, 3)).astype(np.float32))
        m1 = pipe.track(1, rng.random((64, 96, 3)).astype(np.float32))
        assert m0.shape == (64, 96) and m0.dtype == np.int32
        np.testing.assert_array_equal(m0, m1)  # held without tracker

    def test_merge_new_objects(self):
        # min_area scaled down to the 10x10 test grid
        st = SegTracker(None, None, None, min_area=10)
        tracked = np.zeros((10, 10), np.int32)
        tracked[:5] = 1
        detected = np.zeros((10, 10), np.int32)
        detected[:5] = 7      # overlaps existing → dropped
        detected[7:, :] = 8   # new region → kept
        out = st.merge_new_objects(detected, tracked)
        assert (out[:5] == 1).all()
        assert (out[7:] == 8).all()
