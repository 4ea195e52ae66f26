"""End-to-end 2-view rig SLAM test with a geometric-oracle update operator.

Multiview analogue of tests/test_slam_system.py: two synchronized synthetic
streams with a known camera-to-rig offset run through the full
motion-filter → frontend → backend → filler stack (reference
system.py:208-230 multi-view path); BA over the expanded cross-view +
temporal edges must recover the rig-base trajectory.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vipe_tpu.ops import cameras as cam
from vipe_tpu.ops import geom, lie
from vipe_tpu.slam.system import SLAMSystem
from vipe_tpu.streams.base import (
    FrameAttribute,
    MultiviewVideoList,
    VideoFrame,
    VideoStream,
)
from vipe_tpu.utils.geometry import align_trajectories, ate_rmse

H, W = 48, 64
HT, WD = H // 8, W // 8
T = 10
V = 2
DEPTH = 2.0


def make_gt(rng):
    poses_c2w = [lie.se3_identity()]
    for _ in range(1, T):
        xi = jnp.asarray(
            [0.06, 0.004 * rng.normal(), 0.003 * rng.normal(),
             0.002 * rng.normal(), 0.003 * rng.normal(), 0.002 * rng.normal()],
            jnp.float32,
        )
        poses_c2w.append(lie.se3_mul(poses_c2w[-1], lie.se3_exp(xi)))
    poses_w2c = lie.se3_inv(jnp.stack(poses_c2w))

    # view 0 at rig origin; view 1 offset right + yawed 0.1 rad
    rig = jnp.stack([
        lie.se3_identity(),
        lie.se3_exp(jnp.asarray([0.12, 0.0, 0.0, 0.0, 0.1, 0.0], jnp.float32)),
    ])

    u, v = geom.pixel_grid(HT, WD)
    base = (1.0 / DEPTH) * (1.0 + 0.1 * jnp.sin(u / 2.0) * jnp.cos(v / 1.5))
    disps = jnp.stack([
        base * (1.0 + 0.02 * ((k % (T * V)) % 3))
        for k in range(T * V)
    ])  # (T·V, HT, WD) frame-major slots
    intr = jnp.asarray([
        [W * 1.2, W * 1.2, W / 2.0, H / 2.0],
        [W * 1.15, W * 1.15, W / 2.0, H / 2.0],
    ])
    return poses_w2c, rig, disps, intr


class RigViewStream(VideoStream):
    def __init__(self, rng, view, disps_slots, intr):
        self.view = view
        self.imgs = [rng.random((H, W, 3)).astype(np.float32) for _ in range(T)]
        self.disps = np.asarray(disps_slots)
        self.intr = np.asarray(intr, np.float32)

    def __len__(self):
        return T

    def frame_size(self):
        return (H, W)

    def attributes(self):
        return {FrameAttribute.RGB, FrameAttribute.INTRINSICS,
                FrameAttribute.METRIC_DEPTH}

    def __iter__(self):
        for k in range(T):
            slot = k * V + self.view
            depth = np.kron(1.0 / self.disps[slot], np.ones((8, 8), np.float32))
            yield VideoFrame(
                raw_frame_idx=k,
                rgb=self.imgs[k],
                metric_depth=depth,
                intrinsics=self.intr[self.view].copy(),
            )


def make_oracle(buffer_ref, poses_gt, rig_gt, disps_gt, intr_gt):
    """ii/jj arrive as expanded SLOT indices (di, dj); GT flow via the rig
    reprojection chain."""
    intr_grid = intr_gt / 8.0

    def update_fn(params, net, inp, corr, motn, ii, jj, num_frames):
        del params, inp, corr
        E, ht, wd, _ = motn.shape
        u, v = geom.pixel_grid(ht, wd)
        grid = jnp.stack([u, v], -1)
        coords1 = motn[..., 0:2] + grid

        buf = buffer_ref[0]
        di = np.asarray(ii)
        dj = np.asarray(jj)
        pi = np.clip(di // V, 0, buf.buffer_size - 1)
        qi = di % V
        pj = np.clip(dj // V, 0, buf.buffer_size - 1)
        qj = dj % V
        fi = buf.tstamp[pi]
        fj = buf.tstamp[pj]
        gt_coords, gt_valid = geom.reproject_mv(
            poses_gt, rig_gt, disps_gt, intr_grid, cam.CameraType.PINHOLE,
            jnp.asarray(fi, jnp.int32), jnp.asarray(qi, jnp.int32),
            jnp.asarray(fi * V + qi, jnp.int32),
            jnp.asarray(fj, jnp.int32), jnp.asarray(qj, jnp.int32),
        )
        delta = gt_coords - coords1
        weight = jnp.broadcast_to(
            gt_valid[..., None].astype(jnp.float32), delta.shape
        )
        eta = jnp.full((num_frames, ht, wd), 0.01, jnp.float32)
        return net, delta, weight, eta

    update_fn.host_only = True
    return update_fn


@pytest.fixture(scope="module")
def mv_result():
    rng = np.random.default_rng(11)
    poses_gt, rig_gt, disps_gt, intr_gt = make_gt(rng)
    streams = MultiviewVideoList(
        "rig_clip",
        [RigViewStream(rng, vv, disps_gt, intr_gt) for vv in range(V)],
        np.asarray(rig_gt),
    )

    buffer_ref = [None]
    oracle = make_oracle(buffer_ref, poses_gt, rig_gt, disps_gt, intr_gt)

    def encode_features(params, images):
        return jnp.zeros((images.shape[0], HT, WD, 128), jnp.float32)

    def encode_context(params, images):
        z = jnp.zeros((images.shape[0], HT, WD, 128), jnp.float32)
        return z, z

    system = SLAMSystem(
        config=dict(
            resize_area=H * W,
            filter_thresh=-1.0,
            keyframe_thresh=0.0,
            warmup=4,
            buffer=64,
            infill_chunk_size=6,
            backend_iters=8,
        ),
        update_fn=oracle,
        params=None,
        encode_features=encode_features,
        encode_context=encode_context,
    )

    import vipe_tpu.slam.system as sysmod

    orig_buffer_cls = sysmod.GraphBuffer

    class SpyBuffer(orig_buffer_cls):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            buffer_ref[0] = self

    sysmod.GraphBuffer = SpyBuffer
    try:
        out = system.run(streams)
    finally:
        sysmod.GraphBuffer = orig_buffer_cls
    return out, np.asarray(lie.se3_inv(poses_gt))


class TestMultiviewSLAM:
    def test_trajectory_recovered(self, mv_result):
        out, gt_c2w = mv_result
        assert out.trajectory.shape == (T, 7)
        # unaligned metric ATE: depth priors fix scale
        err = ate_rmse(out.trajectory, gt_c2w, align=False)
        assert err < 0.05, err

    def test_outputs_shapes(self, mv_result):
        out, _ = mv_result
        assert out.intrinsics.shape == (V, 4)
        assert out.rig.shape == (V, 7)
        assert out.slam_map is not None
        assert out.slam_map.xyz.shape[1:] == (HT, WD, 3)

    def test_rig_passthrough(self, mv_result):
        """optimize_rig off by default: the provided rig survives refinement."""
        out, _ = mv_result
        assert np.allclose(out.rig[0], [0, 0, 0, 0, 0, 0, 1], atol=1e-6)
