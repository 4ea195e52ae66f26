"""Sparse-tracks wiring: BA term coupling, motion-filter attrition forcing,
and SLAMSystem integration (reference system.py:255, motion_filter.py:112-136,
buffer.py:422-449)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vipe_tpu.slam.buffer import GraphBuffer
from vipe_tpu.slam.factor_graph import FactorGraph
from vipe_tpu.slam.motion_filter import MotionFilter
from vipe_tpu.slam.sparse_tracks import SparseTracks
from vipe_tpu.slam.system import make_droidnet_fns

H, W = 48, 64
HT, WD = H // 8, W // 8
N = 5


class GridTracker(SparseTracks):
    """Deterministic tracker: a grid of keypoints drifting right by
    ``flow`` px/frame; ``drop_after`` kills 30% of tracks past that frame."""

    def __init__(self, n_views: int = 1, flow: float = 4.0, drop_after=None):
        super().__init__(n_views)
        self.flow = flow
        self.drop_after = drop_after

    def track_image(self, frame_idx, frames):
        kid = 0
        for v in range(self.n_views):
            for gy in range(4):
                for gx in range(5):
                    kid += 1
                    if (self.drop_after is not None
                            and frame_idx > self.drop_after and kid % 3 == 0):
                        continue
                    u = 6.0 + gx * 12 + self.flow * frame_idx
                    vv = 6.0 + gy * 10
                    if u < W:
                        self.add_observation(v, kid, frame_idx, [u, vv])


@pytest.fixture(scope="module")
def tiny_droidnet():
    from vipe_tpu.models.droidnet import init_droidnet

    return init_droidnet(jax.random.PRNGKey(0), ht=HT, wd=WD)


def _make_graph(tiny_droidnet, tracker=None, seed=0):
    model, params = tiny_droidnet
    ef, ec, uf = make_droidnet_fns(model)
    rng = np.random.default_rng(seed)
    buf = GraphBuffer(height=H, width=W, buffer_size=32)
    if tracker is not None:
        buf.sparse_tracks = tracker
    for k in range(N):
        img = jnp.asarray((rng.random((H, W, 3)) * 255).astype(np.uint8))
        fmap = ef(params, img[None])[0]
        net, inp = ec(params, img[None])
        buf.append_keyframe(
            k, img, fmap, net[0], inp[0],
            intrinsics=np.asarray([W, W, W / 2, H / 2], np.float32),
        )
        buf.poses = buf.poses.at[k, 0].set(0.1 * k)
        buf.disps = buf.disps.at[k].add(
            0.1 * jnp.asarray(rng.random((HT, WD)), jnp.float32)
        )
    g = FactorGraph(buf, uf, params, max_factors=16, incremental=True)
    g.add_neighborhood_factors(0, N, r=1)
    return buf, g


class TestTracksBATerm:
    def test_splatted_tracks_change_ba_output(self, tiny_droidnet):
        tracker = GridTracker()
        for k in range(N):
            tracker.track_image(k, None)

        buf_a, g_a = _make_graph(tiny_droidnet, tracker=None, seed=2)
        buf_b, g_b = _make_graph(tiny_droidnet, tracker=tracker, seed=2)
        g_a.update()
        g_b.update()
        pa = np.asarray(buf_a.poses[:N])
        pb = np.asarray(buf_b.poses[:N])
        assert np.abs(pa - pb).max() > 1e-6  # the tracks term moved the solve

    def test_disabled_tracker_is_noop(self, tiny_droidnet):
        from vipe_tpu.slam.sparse_tracks import DummySparseTracks

        buf_a, g_a = _make_graph(tiny_droidnet, tracker=None, seed=4)
        buf_b, g_b = _make_graph(
            tiny_droidnet, tracker=DummySparseTracks(), seed=4
        )
        g_a.update()
        g_b.update()
        np.testing.assert_allclose(
            np.asarray(buf_a.poses[:N]), np.asarray(buf_b.poses[:N]),
            atol=1e-7,
        )


class TestMotionFilterSparse:
    def _make_filter(self, tracker, thresh=10.0):
        def ef(params, images):
            return jnp.zeros((images.shape[0], HT, WD, 128), jnp.float32)

        def ec(params, images):
            z = jnp.zeros((images.shape[0], HT, WD, 128), jnp.float32)
            return z, z

        def uf(params, net, inp, corr, motn, ii, jj, num_frames):
            # tiny dense flow: never passes thresh on its own
            delta = jnp.full(motn.shape[:-1] + (2,), 0.01, jnp.float32)
            w = jnp.ones_like(delta)
            eta = jnp.zeros((num_frames, HT, WD), jnp.float32)
            return net, delta, w, eta

        uf.host_only = True
        return MotionFilter(ef, ec, uf, None, thresh=thresh,
                            sparse_tracks=tracker)

    def test_attrition_forces_keyframe(self):
        tracker = GridTracker(drop_after=1)
        mf = self._make_filter(tracker, thresh=10.0)
        img = jnp.zeros((H, W, 3), jnp.float32)

        tracker.track_image(0, None)
        assert mf.check(img)  # frame 0 always a keyframe
        tracker.track_image(1, None)
        assert not mf.check(img)  # tracks stable, dense flow tiny
        tracker.track_image(2, None)  # 30% of tracks vanish → +100 bump
        assert mf.check(img)

    def test_sparse_flow_alone_triggers(self):
        tracker = GridTracker(flow=25.0)
        mf = self._make_filter(tracker, thresh=10.0)
        img = jnp.zeros((H, W, 3), jnp.float32)
        tracker.track_image(0, None)
        assert mf.check(img)
        tracker.track_image(1, None)
        # 25 px keypoint motion > 2·thresh although dense flow is 0.01
        assert mf.check(img)


class SpyTracker(GridTracker):
    calls = []

    def track_image(self, frame_idx, frames):
        SpyTracker.calls.append(frame_idx)
        super().track_image(frame_idx, frames)


class TestSystemIntegration:
    def test_track_image_called_every_frame(self, tiny_droidnet, monkeypatch):
        """SLAMSystem pass 1 must feed every frame to the tracker
        (reference system.py:255)."""
        from vipe_tpu.slam.system import SLAMSystem
        from vipe_tpu.streams.base import FrameAttribute, VideoFrame, VideoStream

        T = 8

        class TinyStream(VideoStream):
            def __len__(self):
                return T

            def frame_size(self):
                return (H, W)

            def attributes(self):
                return {FrameAttribute.RGB, FrameAttribute.INTRINSICS}

            def __iter__(self):
                rng = np.random.default_rng(0)
                for k in range(T):
                    yield VideoFrame(
                        raw_frame_idx=k,
                        rgb=rng.random((H, W, 3)).astype(np.float32),
                        intrinsics=np.asarray([W, W, W / 2, H / 2], np.float32),
                    )

        SpyTracker.calls = []
        system = SLAMSystem(
            config=dict(
                resize_area=H * W, filter_thresh=-1.0, keyframe_thresh=0.0,
                warmup=4, buffer=64, infill_chunk_size=6, backend_iters=2,
                sparse_tracks={
                    "name": "instance",
                    "instance": "tests.test_sparse_tracks_wiring.SpyTracker",
                },
            ),
        )
        system.run(TinyStream())
        assert SpyTracker.calls == list(range(T))


class TestLKSparseTracks:
    def test_tracks_follow_translation(self):
        from types import SimpleNamespace

        from vipe_tpu.slam.sparse_tracks import (
            LKSparseTracks,
            build_sparse_tracks,
        )

        rng = np.random.default_rng(3)
        tex = rng.random((H + 16, W + 16, 3)).astype(np.float32)
        tracker = build_sparse_tracks(
            {"name": "lk", "max_corners": 64, "min_distance": 4}
        )
        assert isinstance(tracker, LKSparseTracks) and tracker.enabled
        for k in range(4):  # camera pans right 2px / frame
            frame = SimpleNamespace(rgb=tex[0:H, 2 * k : 2 * k + W])
            tracker.track_image(k, [frame])

        kps = tracker.get_correspondences(0, 0, 3)
        assert len(kps) >= 10
        src = tracker.get_observations(0, 0, kps)
        dst = tracker.get_observations(0, 3, kps)
        flow = dst - src
        # content moves LEFT by 2px/frame when panning right
        med = np.median(flow, axis=0)
        assert abs(med[0] + 6.0) < 1.0 and abs(med[1]) < 1.0

        target, wgt = tracker.compute_dense_disp_target_weight(
            np.zeros(1, int), np.asarray([0]), np.zeros(1, int),
            np.asarray([3]), (H, W), (HT, WD),
        )
        assert wgt.max() > 0 and target.shape == (1, HT, WD, 2)
