"""End-to-end coverage of the FUSED frontend path with deferred keyframe
removal.

The oracle e2e tests (test_slam_system.py) run a host_only update_fn, which
forces the sequential frontend path — so the fused single-dispatch step and
its deferred removal-decision bookkeeping (frontend.resolve_pending) were
only covered at the FactorGraph level.  These tests drive a full SLAMSystem
with a real (random-weight) tiny DroidNet so can_fuse_frontend_step is True,
and force both decision branches end-to-end:

* keyframe_thresh=0   → every keyframe kept (pure deferral, no removals);
* keyframe_thresh=1e9 → every post-warmup keyframe removed: resolve_pending
  must shift topology/t1/slot-init retroactively on EVERY keyframe, the
  hardest consistency case for the deferred design.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import vipe_tpu.slam.system as sysmod
from vipe_tpu.slam.system import SLAMSystem, make_droidnet_fns
from vipe_tpu.streams.base import FrameAttribute, VideoFrame, VideoStream

H, W = 48, 64
HT, WD = H // 8, W // 8
T = 14


class TextureStream(VideoStream):
    """Panning window over one random texture → coherent synthetic motion."""

    def __init__(self, seed=0, with_masks=False):
        rng = np.random.default_rng(seed)
        self.tex = rng.random((H + 32, W + 32, 3)).astype(np.float32)
        self.with_masks = with_masks

    def __len__(self):
        return T

    def frame_size(self):
        return (H, W)

    def attributes(self):
        attrs = {FrameAttribute.RGB, FrameAttribute.INTRINSICS}
        if self.with_masks:
            attrs.add(FrameAttribute.MASK)
        return attrs

    def __iter__(self):
        for k in range(T):
            o = 2 * k
            mask = None
            if self.with_masks:
                mask = np.ones((H, W), bool)
                mask[: H // 3] = False  # invalid band (e.g. dynamic object)
            yield VideoFrame(
                raw_frame_idx=k,
                rgb=self.tex[0:H, o: o + W],
                intrinsics=np.asarray([W, W, W / 2, H / 2], np.float32),
                mask=mask,
            )


@pytest.fixture(scope="module")
def droid_fns():
    from vipe_tpu.models.droidnet import init_droidnet

    model, params = init_droidnet(jax.random.PRNGKey(0), ht=HT, wd=WD)
    return make_droidnet_fns(model), params


def _run(droid_fns, keyframe_thresh, **cfg):
    (ef, ec, uf), params = droid_fns
    frontends = []

    class SpyFrontend(sysmod.SLAMFrontend):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            frontends.append(self)

    orig = sysmod.SLAMFrontend
    sysmod.SLAMFrontend = SpyFrontend
    try:
        system = SLAMSystem(
            config=dict(
                resize_area=H * W,
                filter_thresh=-1.0,      # every frame a keyframe
                keyframe_thresh=keyframe_thresh,
                warmup=4,
                buffer=32,
                infill_chunk_size=6,
                backend_iters=4,
                **cfg,
            ),
            update_fn=uf,
            params=params,
            encode_features=ef,
            encode_context=ec,
        )
        out = system.run(TextureStream())
    finally:
        sysmod.SLAMFrontend = orig
    return out, frontends[0]


class TestDeferredFrontend:
    def test_keep_branch_end_to_end(self, droid_fns):
        out, fe = _run(droid_fns, keyframe_thresh=0.0)
        assert fe.graph.can_fuse_frontend_step  # the fused path really ran
        assert not fe._pending                  # everything resolved
        assert fe.n_removals == 0
        assert fe.t1 == T                       # all keyframes kept
        assert out.trajectory.shape == (T, 7)
        assert np.isfinite(out.trajectory).all()

    def test_remove_branch_end_to_end(self, droid_fns):
        """Every post-warmup keyframe removed: every pending decision takes
        the removal path — at depth 2 that exercises the LATE removal
        (rm_keyframe with a shifted scratch top + younger-decision rescore)
        on every keyframe, the hardest consistency case."""
        out, fe = _run(droid_fns, keyframe_thresh=1e9)
        assert fe.graph.can_fuse_frontend_step
        assert not fe._pending
        # only the warmup keyframes survive: every post-warmup keyframe is
        # removed when its pending decision resolves
        assert fe.n_removals == T - 4
        assert fe.t1 == fe.buffer.n_frames == 4
        assert out.trajectory.shape == (T, 7)
        assert np.isfinite(out.trajectory).all()

    def test_remove_branch_depth1(self, droid_fns):
        """Same as above at spec depth 1 (reference-exact removal order)."""
        out, fe = _run(droid_fns, keyframe_thresh=1e9, keyframe_spec_depth=1)
        assert not fe._pending
        assert fe.n_removals == T - 4
        assert fe.t1 == fe.buffer.n_frames == 4
        assert np.isfinite(out.trajectory).all()

    def test_deferred_matches_immediate(self, droid_fns):
        """Depth-1 deferral must be semantics-preserving: a run whose pending
        decision is resolved immediately after every frontend step produces
        bit-identical keyframe topology and (up to float tolerance) the same
        trajectory."""
        out_a, fe_a = _run(droid_fns, keyframe_thresh=0.35,
                           keyframe_spec_depth=1)

        orig_run = sysmod.SLAMFrontend.run

        def eager_run(self):
            orig_run(self)
            self.resolve_pending()  # kill the deferral window

        sysmod.SLAMFrontend.run = eager_run
        try:
            out_b, fe_b = _run(droid_fns, keyframe_thresh=0.35,
                               keyframe_spec_depth=1)
        finally:
            sysmod.SLAMFrontend.run = orig_run

        assert fe_a.n_removals == fe_b.n_removals
        assert fe_a.t1 == fe_b.t1
        np.testing.assert_allclose(
            out_a.trajectory, out_b.trajectory, rtol=1e-4, atol=1e-4
        )

    def test_depth2_keep_path_matches_depth1(self, droid_fns):
        """With no removals the depth-2 pipeline is the same computation as
        depth 1 — only the readback timing differs."""
        out_a, fe_a = _run(droid_fns, keyframe_thresh=0.0)
        out_b, fe_b = _run(droid_fns, keyframe_thresh=0.0,
                           keyframe_spec_depth=1)
        assert fe_a.t1 == fe_b.t1
        np.testing.assert_allclose(
            out_a.trajectory, out_b.trajectory, rtol=1e-5, atol=1e-5
        )

    def test_masks_flow_through_both_passes(self, droid_fns):
        """Frames with validity masks: pass 1 uploads per keyframe, pass 2
        uses the batched mask upload — the buffer's /8 invalid-masks must be
        populated (top band invalid) and the run must stay finite."""
        (ef, ec, uf), params = droid_fns
        system = SLAMSystem(
            config=dict(
                resize_area=H * W, filter_thresh=-1.0, keyframe_thresh=0.0,
                warmup=4, buffer=32, infill_chunk_size=6, backend_iters=2,
            ),
            update_fn=uf, params=params,
            encode_features=ef, encode_context=ec,
        )
        out = system.run(TextureStream(with_masks=True))
        assert np.isfinite(out.trajectory).all()
        assert out.trajectory.shape == (T, 7)

    def test_live_filter_pipeline_depth_equivalence(self, droid_fns):
        """LIVE motion-filter scoring (finite threshold — the production /
        BENCH_MODE=real path): the depth-2 decision pipeline must produce
        the SAME keyframe set and trajectory as depth 1 — stale tokens are
        re-scored against the promoted reference, so decisions are
        timing-independent."""
        (ef, ec, uf), params = droid_fns

        def run(depth):
            # calibrate a threshold that yields a mixed keyframe pattern
            system = SLAMSystem(
                config=dict(
                    resize_area=H * W, filter_thresh=0.35,
                    keyframe_thresh=0.0, warmup=4, buffer=32,
                    infill_chunk_size=6, backend_iters=2,
                    filter_pipeline_depth=depth,
                ),
                update_fn=uf, params=params,
                encode_features=ef, encode_context=ec,
            )
            out = system.run(TextureStream())
            return out

        out_a = run(2)
        out_b = run(1)
        np.testing.assert_allclose(
            out_a.trajectory, out_b.trajectory, rtol=1e-4, atol=1e-4
        )

    def test_fmap_parking_matches_reencode(self, droid_fns):
        """Pass-2 fmap parking (infill rows appended by device row-copy from
        the pass-1 parking store) must be bit-equivalent to the re-upload +
        re-encode path: the same uint8 frame encodes to the same fmap, and an
        infill row's OTHER arrays (images/nets/inps/masks/disps) are never
        read on the fused-filler path.  keyframe_thresh=1e9 removes every
        post-warmup keyframe, so most frames go through the parked branch.

        Tolerance, not bit-equality: the parked fmap is encoded at submit
        (batch 1) while the re-encode path runs stacked batch-8 encodes, and
        XLA's bf16 convs round differently per batch shape — the same frame's
        fmap differs in the last bf16 bit, which the 10 BA rounds amplify to
        ~1e-4 in the pose quaternions."""
        out_a, _ = _run(droid_fns, keyframe_thresh=1e9)
        out_b, _ = _run(droid_fns, keyframe_thresh=1e9,
                        park_fmaps_max_frames=0)
        np.testing.assert_allclose(
            out_a.trajectory, out_b.trajectory, rtol=0, atol=5e-3
        )
        # and on a mixed keep/remove pattern with masks
        (ef, ec, uf), params = droid_fns

        def run_masked(park):
            system = SLAMSystem(
                config=dict(
                    resize_area=H * W, filter_thresh=0.35,
                    keyframe_thresh=0.35, warmup=4, buffer=32,
                    infill_chunk_size=6, backend_iters=2,
                    park_fmaps_max_frames=2048 if park else 0,
                ),
                update_fn=uf, params=params,
                encode_features=ef, encode_context=ec,
            )
            return system.run(TextureStream(with_masks=True))

        out_c = run_masked(True)
        out_d = run_masked(False)
        np.testing.assert_allclose(
            out_c.trajectory, out_d.trajectory, rtol=0, atol=5e-3
        )

    def test_fmap_parking_skip_mode_opt_in(self, droid_fns):
        """Fixed-stride skip mode with park_fmaps_in_skip_mode=true: pass 1
        uploads+encodes non-keyframes for parking, pass 2 appends them by
        row-copy — must match the batched re-encode path within bf16
        batch-shape rounding."""
        (ef, ec, uf), params = droid_fns

        def run(park):
            system = SLAMSystem(
                config=dict(
                    resize_area=H * W, filter_thresh=float("inf"),
                    keyframe_stride=2, keyframe_thresh=0.0, warmup=4,
                    buffer=32, infill_chunk_size=6, backend_iters=2,
                    park_fmaps_in_skip_mode=park,
                ),
                update_fn=uf, params=params,
                encode_features=ef, encode_context=ec,
            )
            return system.run(TextureStream())

        out_a = run(True)
        out_b = run(False)
        np.testing.assert_allclose(
            out_a.trajectory, out_b.trajectory, rtol=0, atol=5e-3
        )

    def test_corr_mode_alt_end_to_end(self, droid_fns):
        """corr_mode='alt' must run the FULL system (append / rm_factors
        permutes / fused frontend step / removal machinery over the packed
        5-entry corr state) and produce finite outputs.  Numeric parity to
        the volume mode is pinned per-round (test_fused_update) and per
        lookup (test_pallas_corr) — full trajectories diverge chaotically
        with random weights, so closeness here would be meaningless."""
        (ef, ec, uf), params = droid_fns
        system = SLAMSystem(
            config=dict(
                resize_area=H * W, filter_thresh=-1.0,
                keyframe_thresh=1.0, warmup=4, buffer=32,
                infill_chunk_size=6, backend_iters=2, corr_mode="alt",
            ),
            update_fn=uf, params=params,
            encode_features=ef, encode_context=ec,
        )
        out = system.run(TextureStream())
        assert out.trajectory.shape[0] == T
        assert np.isfinite(out.trajectory).all()

    def test_upload_prefetch_equivalence(self, droid_fns):
        """The threaded host→device feed (prefetch_depth) must be
        bit-equivalent to the synchronous path — the thread only moves WHEN
        decode/uploads happen, never what is computed.  Covers the live
        filter path with masks + removals (parking active)."""
        (ef, ec, uf), params = droid_fns

        def run(depth):
            system = SLAMSystem(
                config=dict(
                    resize_area=H * W, filter_thresh=0.35,
                    keyframe_thresh=0.35, warmup=4, buffer=32,
                    infill_chunk_size=6, backend_iters=2,
                    prefetch_depth=depth,
                ),
                update_fn=uf, params=params,
                encode_features=ef, encode_context=ec,
            )
            return system.run(TextureStream(with_masks=True))

        out_a = run(0)
        out_b = run(3)
        np.testing.assert_allclose(
            out_a.trajectory, out_b.trajectory, rtol=0, atol=0
        )

    def test_grouped_scores_match_per_frame(self, droid_fns):
        """The batched score program (motion_filter.submit_group: one
        stacked encode + one GRU dispatch + one vector readback per group)
        must produce the same per-frame scores as single submits, up to
        bf16 batch-shape conv rounding — decisions are a thresholding of
        these scores, so score equality IS decision equivalence (a
        decision sitting exactly on the threshold can flip, same caveat as
        fmap parking)."""
        import jax.numpy as jnp

        from vipe_tpu.slam.motion_filter import MotionFilter

        (ef, ec, uf), params = droid_fns
        frames = [
            (np.clip(f.rgb, 0, 1) * 255).astype(np.uint8)
            for f in TextureStream()
        ]
        imgs = jnp.asarray(np.stack(frames))  # (T, H, W, 3)

        mf_a = MotionFilter(ef, ec, uf, params, thresh=1e9)
        scores_a = []
        for k in range(8):
            tok = mf_a.submit(imgs[k])
            scores_a.append(None if tok.score is None else float(tok.score))

        mf_b = MotionFilter(ef, ec, uf, params, thresh=1e9)
        scores_b = []
        for g0 in range(0, 8, 4):
            toks, fmaps = mf_b.submit_group(imgs[g0: g0 + 4])
            assert fmaps.shape[0] == 4
            for tok in toks:
                scores_b.append(
                    None if tok.score is None else float(tok.score)
                )

        assert scores_a[0] is None and scores_b[0] is None  # init frame
        np.testing.assert_allclose(
            scores_a[1:], scores_b[1:], rtol=5e-3, atol=5e-3
        )

    def test_grouped_pass1_end_to_end(self, droid_fns):
        """Live-filter e2e through the grouped pass-1 path: finite result,
        < 1 upload per frame in the profiling accumulator (VERDICT r03
        item 8), and a keyframe count consistent with the per-frame path."""
        from vipe_tpu.utils import profiling

        (ef, ec, uf), params = droid_fns

        def run(ub):
            profiling.snapshot(reset=True)
            system = SLAMSystem(
                config=dict(
                    resize_area=H * W, filter_thresh=0.35,
                    keyframe_thresh=0.35, warmup=4, buffer=32,
                    infill_chunk_size=6, backend_iters=2,
                    upload_batch=ub,
                ),
                update_fn=uf, params=params,
                encode_features=ef, encode_context=ec,
            )
            out = system.run(TextureStream(with_masks=True))
            return out, profiling.snapshot(reset=True)

        out_a, prof_a = run(4)
        out_b, prof_b = run(1)
        assert out_a.trajectory.shape == out_b.trajectory.shape == (T, 7)
        assert np.isfinite(out_a.trajectory).all()
        # one stacked transfer per group — the VERDICT item's "done" bar
        assert prof_a["p1_upload"]["n"] <= -(-T // 4)  # ceil(T/4) groups
        assert "p1_upload" not in prof_b  # per-frame path, no group counter

    def test_depth2_removals_converge_to_same_keyframes(self, droid_fns):
        """With removals, depth 2 applies them one keyframe late: the doomed
        keyframe participates in the next keyframe's optimization rounds, so
        later near-threshold decisions are scored from a slightly different
        state than depth 1 (which removed it first).  Exact set-equality is
        therefore NOT guaranteed by construction — only that the selection
        converges to (at most) one borderline keyframe of difference; the
        keep-all / remove-all stress tests above pin the exact-agreement
        branches, and keyframe_spec_depth=1 is the reference-exact mode.

        proximity_spec is pinned OFF: this test isolates removal-TIMING
        divergence, and the pre-step (one-BA-step-stale) proximity
        distances add an orthogonal edge-proposal perturbation that can
        legitimately shift near-threshold keyframe sets further apart
        (covered by test_sync_budget.test_prox_spec_recovers_trajectory)."""
        out_a, fe_a = _run(droid_fns, keyframe_thresh=0.35,
                           proximity_spec=False)
        out_b, fe_b = _run(droid_fns, keyframe_thresh=0.35,
                           keyframe_spec_depth=1, proximity_spec=False)
        # the removal machinery fired at both depths
        assert fe_a.n_removals > 0 and fe_b.n_removals > 0
        set_a = set(fe_a.buffer.tstamp[: fe_a.buffer.n_frames].tolist())
        set_b = set(fe_b.buffer.tstamp[: fe_b.buffer.n_frames].tolist())
        assert len(set_a ^ set_b) <= 2, (sorted(set_a), sorted(set_b))
        assert abs(fe_a.t1 - fe_b.t1) <= 1
