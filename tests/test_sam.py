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

    def test_batched_boxes_match_single(self, predictor, rng):
        """segment_with_boxes (one program per chunk, on-device best-mask
        selection) must agree with per-box calls — boundary pixels may flip
        at f32 batch-order epsilon, interior must match."""
        predictor.set_image(rng.random((96, 128, 3)).astype(np.float32))
        boxes = [[5, 5, 40, 40], [60, 50, 120, 90], [20, 15, 90, 70]]
        batched = predictor.segment_with_boxes(boxes)
        assert batched.shape == (3, 96, 128) and batched.dtype == bool
        for b, box in zip(batched, boxes):
            single = predictor.segment_with_box(box)
            assert (b == single).mean() > 0.999
        assert predictor.segment_with_boxes(
            np.zeros((0, 4), np.float32)
        ).shape == (0, 96, 128)

    def test_segment_composite_matches_sequential(self, predictor, rng):
        """segment_composite (on-device first-wins + area filter, one int32
        readback) must equal the sequential reference semantics over
        segment_with_boxes masks, including min_area drops and id order."""
        predictor.set_image(rng.random((96, 128, 3)).astype(np.float32))
        boxes = [[5, 5, 60, 60], [50, 40, 120, 90], [64, 64, 66, 66],
                 [20, 15, 90, 70]]
        masks = predictor.segment_with_boxes(boxes)
        min_area = int(sorted(m.sum() for m in masks)[1]) + 1  # drops ≥1
        ref = np.zeros((96, 128), np.int32)
        ref_ids, nid = [], 7
        for m in masks:
            if m.sum() < min_area:
                ref_ids.append(0)
                continue
            nid += 1
            ref[m & (ref == 0)] = nid
            ref_ids.append(nid)
        inst, ids = predictor.segment_composite(boxes, min_area, 8)
        assert list(ids) == ref_ids
        assert (inst == ref).mean() > 0.999  # bf16/boundary epsilon only
        inst0, ids0 = predictor.segment_composite(
            np.zeros((0, 4), np.float32), 1, 1
        )
        assert inst0.shape == (96, 128) and len(ids0) == 0

    def test_image_resolution_independent_params(self, predictor, rng):
        """Non-square inputs resize+pad to the model square."""
        predictor.set_image(rng.random((50, 120, 3)).astype(np.float32))
        m = predictor.segment_with_box([10, 10, 100, 40])
        assert m.shape == (50, 120)


class TestSamConverter:
    def test_synthetic_state_dict_tree_parity(self, rng):
        """Meta-SAM-shaped state_dict converts to the exact flax tree
        (img_size 128 keeps the init fast; shapes scale with the grid)."""
        import jax

        from vipe_tpu.models import convert as mconvert
        from vipe_tpu.priors.track_anything.sam import SAM_CONFIGS

        cfg = SAM_CONFIGS["vit_b"]
        D, depth, heads = cfg["embed_dim"], cfg["depth"], cfg["num_heads"]
        g = 128 // 16
        ws = 14
        P = 256  # prompt dim
        sd = {}

        def add(key, shape):
            sd[key] = rng.normal(size=shape).astype(np.float32) * 0.02

        e = "image_encoder"
        add(f"{e}.patch_embed.proj.weight", (D, 3, 16, 16))
        add(f"{e}.patch_embed.proj.bias", (D,))
        add(f"{e}.pos_embed", (1, g, g, D))
        hd = D // heads
        for i in range(depth):
            b = f"{e}.blocks.{i}"
            r = g if i in cfg["global_attn"] else ws
            add(f"{b}.norm1.weight", (D,)); add(f"{b}.norm1.bias", (D,))
            add(f"{b}.attn.qkv.weight", (3 * D, D))
            add(f"{b}.attn.qkv.bias", (3 * D,))
            add(f"{b}.attn.proj.weight", (D, D))
            add(f"{b}.attn.proj.bias", (D,))
            add(f"{b}.attn.rel_pos_h", (2 * r - 1, hd))
            add(f"{b}.attn.rel_pos_w", (2 * r - 1, hd))
            add(f"{b}.norm2.weight", (D,)); add(f"{b}.norm2.bias", (D,))
            add(f"{b}.mlp.lin1.weight", (4 * D, D))
            add(f"{b}.mlp.lin1.bias", (4 * D,))
            add(f"{b}.mlp.lin2.weight", (D, 4 * D))
            add(f"{b}.mlp.lin2.bias", (D,))
        add(f"{e}.neck.0.weight", (P, D, 1, 1))
        add(f"{e}.neck.1.weight", (P,)); add(f"{e}.neck.1.bias", (P,))
        add(f"{e}.neck.2.weight", (P, P, 3, 3))
        add(f"{e}.neck.3.weight", (P,)); add(f"{e}.neck.3.bias", (P,))

        pr = "prompt_encoder"
        add(f"{pr}.pe_layer.positional_encoding_gaussian_matrix", (2, P // 2))
        for i in range(4):
            add(f"{pr}.point_embeddings.{i}.weight", (1, P))
        add(f"{pr}.no_mask_embed.weight", (1, P))
        # mask-prompt downscaling stack (prompt_encoder.py:56-64)
        add(f"{pr}.mask_downscaling.0.weight", (4, 1, 2, 2))
        add(f"{pr}.mask_downscaling.0.bias", (4,))
        add(f"{pr}.mask_downscaling.1.weight", (4,))
        add(f"{pr}.mask_downscaling.1.bias", (4,))
        add(f"{pr}.mask_downscaling.3.weight", (16, 4, 2, 2))
        add(f"{pr}.mask_downscaling.3.bias", (16,))
        add(f"{pr}.mask_downscaling.4.weight", (16,))
        add(f"{pr}.mask_downscaling.4.bias", (16,))
        add(f"{pr}.mask_downscaling.6.weight", (P, 16, 1, 1))
        add(f"{pr}.mask_downscaling.6.bias", (P,))

        d = "mask_decoder"
        add(f"{d}.iou_token.weight", (1, P))
        add(f"{d}.mask_tokens.weight", (4, P))

        def tw(base, internal):
            add(f"{base}.q_proj.weight", (internal, P))
            add(f"{base}.q_proj.bias", (internal,))
            add(f"{base}.k_proj.weight", (internal, P))
            add(f"{base}.k_proj.bias", (internal,))
            add(f"{base}.v_proj.weight", (internal, P))
            add(f"{base}.v_proj.bias", (internal,))
            add(f"{base}.out_proj.weight", (P, internal))
            add(f"{base}.out_proj.bias", (P,))

        for i in range(2):
            b = f"{d}.transformer.layers.{i}"
            tw(f"{b}.self_attn", P)
            tw(f"{b}.cross_attn_token_to_image", P // 2)
            tw(f"{b}.cross_attn_image_to_token", P // 2)
            for n in (1, 2, 3, 4):
                add(f"{b}.norm{n}.weight", (P,)); add(f"{b}.norm{n}.bias", (P,))
            add(f"{b}.mlp.lin1.weight", (2048, P))
            add(f"{b}.mlp.lin1.bias", (2048,))
            add(f"{b}.mlp.lin2.weight", (P, 2048))
            add(f"{b}.mlp.lin2.bias", (P,))
        tw(f"{d}.transformer.final_attn_token_to_image", P // 2)
        add(f"{d}.transformer.norm_final_attn.weight", (P,))
        add(f"{d}.transformer.norm_final_attn.bias", (P,))
        add(f"{d}.output_upscaling.0.weight", (P, P // 4, 2, 2))
        add(f"{d}.output_upscaling.0.bias", (P // 4,))
        add(f"{d}.output_upscaling.1.weight", (P // 4,))
        add(f"{d}.output_upscaling.1.bias", (P // 4,))
        add(f"{d}.output_upscaling.3.weight", (P // 4, P // 8, 2, 2))
        add(f"{d}.output_upscaling.3.bias", (P // 8,))
        for k in range(4):
            dims = [(P, P), (P, P), (P // 8, P)]
            for j, (o, i_) in enumerate(dims):
                add(f"{d}.output_hypernetworks_mlps.{k}.layers.{j}.weight",
                    (o, i_))
                add(f"{d}.output_hypernetworks_mlps.{k}.layers.{j}.bias", (o,))
        for j, (o, i_) in enumerate([(256, P), (256, 256), (4, 256)]):
            add(f"{d}.iou_prediction_head.layers.{j}.weight", (o, i_))
            add(f"{d}.iou_prediction_head.layers.{j}.bias", (o,))

        converted = mconvert.convert_sam(sd)
        fresh = SamPredictor("vit_b", img_size=128)
        fi = {jax.tree_util.keystr(p): v.shape
              for p, v in jax.tree_util.tree_leaves_with_path(fresh.params)}
        ci = {jax.tree_util.keystr(p): np.shape(v)
              for p, v in jax.tree_util.tree_leaves_with_path(converted)}
        assert fi == ci, (
            sorted(set(fi) - set(ci))[:5], sorted(set(ci) - set(fi))[:5]
        )

        pred = SamPredictor("vit_b", params=converted, img_size=128)
        pred.set_image(rng.random((96, 128, 3)).astype(np.float32))
        m = pred.segment_with_box([20, 15, 90, 70])
        assert m.shape == (96, 128)


class _FakeDetector:
    def run_grounding(self, rgb, phrases, return_phrases=False):
        h, w = rgb.shape[:2]
        boxes = [[w * 0.1, h * 0.1, w * 0.5, h * 0.6]]
        if return_phrases:
            return boxes, [phrases[0]]
        return boxes


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
        m0, p0 = pipe.track(0, rng.random((64, 96, 3)).astype(np.float32))
        m1, p1 = pipe.track(1, rng.random((64, 96, 3)).astype(np.float32))
        assert m0.shape == (64, 96) and m0.dtype == np.int32
        np.testing.assert_array_equal(m0, m1)  # held without tracker
        # phrase map covers exactly the ids present (reference track returns
        # (mask, dict[int, str]))
        assert set(p0) == set(np.unique(m0)) - {0}
        assert p0 == p1

    def test_sky_mask_flow(self, rng):
        """'sky' detections flow into VideoFrame.sky_mask; sky stays VALID
        in the SLAM weight mask (reference processors.py:137-139) and a
        sky-labelled frame reports a nonzero sky_mask (base.py:256-263)."""
        from vipe_tpu.priors.track_anything import TrackAnythingPipeline
        from vipe_tpu.priors.track_anything.sam import SamPredictor
        from vipe_tpu.streams.base import VideoFrame

        class _SkyDetector:
            def run_grounding(self, rgb, phrases, return_phrases=False):
                assert "sky" in phrases  # NOT stripped from detection
                h, w = rgb.shape[:2]
                boxes = [[0, 0, w * 0.9, h * 0.4]]
                return (boxes, ["sky"]) if return_phrases else boxes

        pipe = TrackAnythingPipeline(
            ["person", "sky"], detector=_SkyDetector(), sam_gap=2,
            use_tracker=False,
        )
        pipe.seg_tracker.segmentor = SamPredictor("vit_b", img_size=128)
        rgb = rng.random((64, 96, 3)).astype(np.float32)
        inst, phrases_map = pipe.track(0, rgb)
        assert inst.any() and all(v == "sky" for v in phrases_map.values())
        frame = VideoFrame(
            raw_frame_idx=0, rgb=rgb, instance=inst,
            instance_phrases=phrases_map,
        )
        np.testing.assert_array_equal(frame.sky_mask, inst > 0)
        # sky kept valid: (instance == 0) | sky covers the whole frame
        assert ((inst == 0) | frame.sky_mask).all()
        # resize preserves the phrase mapping (dataclasses.replace)
        small = frame.resize((32, 48))
        assert small.instance_phrases == phrases_map
        assert small.sky_mask.shape == (32, 48) and small.sky_mask.any()

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
