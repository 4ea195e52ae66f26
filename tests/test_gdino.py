"""GroundingDINO port tests: ms_deform_attn numerical oracle vs torch
grid_sample, special-token mask semantics, tiny-model forward/threshold
behavior, converter structure parity against a reference-shaped synthetic
state dict, and the detect→SAM-segment integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vipe_tpu.priors.track_anything.gdino import (
    GDINOConfig,
    GroundingDINODetector,
    GroundingDINOModel,
)
from vipe_tpu.priors.track_anything.gdino.bert import (
    CLS_ID,
    DOT_ID,
    SEP_ID,
    HashTokenizer,
    generate_special_token_masks,
)
from vipe_tpu.priors.track_anything.gdino.convert import (
    convert_gdino,
    synthetic_state_dict,
)
from vipe_tpu.priors.track_anything.gdino.msda import ms_deform_attn


class TestMSDeformAttn:
    def test_matches_torch_grid_sample(self, rng):
        """Oracle: the reference's pure-torch fallback
        (ms_deform_attn.py:92-134) built on F.grid_sample."""
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        B, H, C, Q, P = 1, 2, 4, 5, 3
        shapes = [(6, 8), (3, 4)]
        L = len(shapes)
        S = sum(h * w for h, w in shapes)
        value = rng.standard_normal((B, S, H, C)).astype(np.float32)
        loc = rng.random((B, Q, H, L, P, 2)).astype(np.float32)
        w = rng.random((B, Q, H, L, P)).astype(np.float32)
        w = w / w.sum((-1, -2), keepdims=True)

        got = np.asarray(ms_deform_attn(
            jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w)
        ))

        # torch reference
        tv = torch.from_numpy(value)
        tl = torch.from_numpy(loc)
        tw = torch.from_numpy(w)
        value_list = tv.split([h_ * w_ for h_, w_ in shapes], dim=1)
        grids = 2 * tl - 1
        samples = []
        for lvl, (h_, w_) in enumerate(shapes):
            v_ = value_list[lvl].flatten(2).transpose(1, 2).reshape(
                B * H, C, h_, w_)
            g_ = grids[:, :, :, lvl].transpose(1, 2).flatten(0, 1)
            samples.append(F.grid_sample(
                v_, g_, mode="bilinear", padding_mode="zeros",
                align_corners=False))
        aw = tw.transpose(1, 2).reshape(B * H, 1, Q, L * P)
        ref = (torch.stack(samples, -2).flatten(-2) * aw).sum(-1)
        ref = ref.view(B, H * C, Q).transpose(1, 2).numpy()
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


class TestSpecialTokenMasks:
    def test_segments_isolated(self):
        w = 5000
        ids = np.asarray([[CLS_ID, w, w + 1, DOT_ID, w + 2, DOT_ID, SEP_ID, 0]])
        mask, pos = generate_special_token_masks(ids)
        # tokens 1-3 form phrase 1 (attend among themselves + their dot)
        assert mask[0, 1, 2] and mask[0, 2, 3]
        assert not mask[0, 1, 4]   # phrase 1 cannot see phrase 2
        assert not mask[0, 4, 1]
        assert mask[0, 4, 5]
        # per-phrase positions restart
        np.testing.assert_array_equal(pos[0, 1:4], [0, 1, 2])
        np.testing.assert_array_equal(pos[0, 4:6], [0, 1])

    def test_hash_tokenizer_caption(self):
        tok = HashTokenizer()
        ids = tok("person . dog .")
        assert ids[0] == CLS_ID and ids[-1] == SEP_ID
        assert ids.count(DOT_ID) == 2
        assert tok("person . dog .") == ids  # deterministic


@pytest.fixture(scope="module")
def tiny_detector():
    return GroundingDINODetector(
        GDINOConfig.tiny(), short_side=64, max_side=96, box_threshold=0.3
    )


class TestGroundingDINO:
    def test_forward_shapes(self, tiny_detector, rng):
        cfg = tiny_detector.cfg
        rgb = rng.random((48, 72, 3)).astype(np.float32)
        boxes, phrases = tiny_detector.run_grounding(
            rgb, ["person", "dog"], return_phrases=True
        )
        assert len(boxes) == len(phrases)
        for b in boxes:
            assert b.shape == (4,)
            assert b[2] >= b[0] and b[3] >= b[1]
        assert all(p in ("person", "dog") for p in phrases)

    def test_threshold_monotone(self, tiny_detector, rng):
        rgb = rng.random((48, 72, 3)).astype(np.float32)
        lo = tiny_detector
        n_lo = len(lo.run_grounding(rgb, ["person"]))
        lo.box_threshold = 0.95
        try:
            n_hi = len(lo.run_grounding(rgb, ["person"]))
        finally:
            lo.box_threshold = 0.3
        assert n_hi <= n_lo

    def test_box_format_conversion(self, rng):
        """Normalized cxcywh → xyxy pixels in the ORIGINAL frame, fixed
        forward (deterministic under random weights)."""
        det = GroundingDINODetector(
            GDINOConfig.tiny(), short_side=64, max_side=96, box_threshold=0.5
        )
        nq, lt = det.cfg.num_queries, det.cfg.max_text_len
        logits = np.full((1, nq, lt), -10.0, np.float32)
        logits[0, 0, 1] = 10.0   # one confident detection
        boxes = np.zeros((1, nq, 4), np.float32)
        boxes[0, 0] = [0.5, 0.25, 0.2, 0.1]  # cxcywh normalized
        det._params = {}
        det._apply = lambda p, *a: (jnp.asarray(logits), jnp.asarray(boxes))
        out = det.run_grounding(
            rng.random((100, 200, 3)).astype(np.float32), ["person"]
        )
        assert len(out) == 1
        np.testing.assert_allclose(out[0], [80.0, 20.0, 120.0, 30.0], atol=1e-4)


class TestGDINOConverter:
    def test_synthetic_state_dict_round_trip(self, rng):
        """convert(synthetic reference-shaped state dict) must produce the
        exact flax tree of model.init — key-by-key shape parity (the
        VERDICT round-2 done-criterion for converter dry-runs)."""
        cfg = GDINOConfig.tiny()
        model = GroundingDINOModel(cfg)
        L = 32
        img = jnp.zeros((1, 64, 96, 3))
        ids = jnp.zeros((1, L), jnp.int32)
        m3 = jnp.ones((1, L, L), bool)
        pid = jnp.zeros((1, L), jnp.int32)
        tm = jnp.ones((1, L), bool)
        ref_params = model.init(jax.random.PRNGKey(0), img, ids, m3, pid, tm)

        conv = convert_gdino(synthetic_state_dict(cfg), cfg)
        ref_flat = jax.tree_util.tree_flatten_with_path(ref_params)[0]
        got_flat = jax.tree_util.tree_flatten_with_path(conv)[0]
        ref_map = {jax.tree_util.keystr(k): v.shape for k, v in ref_flat}
        got_map = {jax.tree_util.keystr(k): np.asarray(v).shape
                   for k, v in got_flat}
        missing = sorted(set(ref_map) - set(got_map))
        extra = sorted(set(got_map) - set(ref_map))
        assert not missing, f"converter missing params: {missing[:8]}"
        assert not extra, f"converter extra params: {extra[:8]}"
        bad = [k for k in ref_map if ref_map[k] != got_map[k]]
        assert not bad, f"shape mismatches: {[(k, ref_map[k], got_map[k]) for k in bad[:5]]}"

    def test_converted_params_run(self):
        cfg = GDINOConfig.tiny()
        det = GroundingDINODetector(cfg, short_side=64, max_side=96)
        det._params = convert_gdino(synthetic_state_dict(cfg), cfg)
        det._params = jax.tree_util.tree_map(jnp.asarray, det._params)
        rgb = np.random.default_rng(1).random((48, 72, 3)).astype(np.float32)
        boxes = det.run_grounding(rgb, ["person"])
        assert isinstance(boxes, list)


class TestDetectSegmentIntegration:
    def test_instance_masks_from_tiny_gdino_and_sam(self, rng):
        """Full detect→segment path with random weights: instance map comes
        back at frame resolution with ids for kept detections."""
        from vipe_tpu.priors.track_anything import TrackAnythingPipeline
        from vipe_tpu.priors.track_anything.sam import SamPredictor

        det = GroundingDINODetector(
            GDINOConfig.tiny(), short_side=64, max_side=96, box_threshold=0.3
        )
        pipe = TrackAnythingPipeline(["person", "sky"], detector=det, sam_gap=2)
        pipe.seg_tracker.segmentor = SamPredictor("vit_b", img_size=128)
        m0, _ = pipe.track(0, rng.random((64, 96, 3)).astype(np.float32))
        assert m0.shape == (64, 96) and m0.dtype == np.int32
