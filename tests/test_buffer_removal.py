"""Unit tests for keyframe-slot removal shifts.

``GraphBuffer.remove_slot(ix, top)`` is the device-side backbone of both
the reference second-newest removal (top = n_frames-1) and the speculative
LATE removal (top = scratch slot above n_frames); these pin down the shift
semantics directly, independent of the e2e paths in
test_frontend_deferred.py.
"""

import numpy as np

import jax.numpy as jnp

from vipe_tpu.slam.buffer import GraphBuffer
from vipe_tpu.slam.factor_graph import FactorGraph

H, W = 48, 64


def _filled_buffer(n=6, scratch_mark=99.0):
    buf = GraphBuffer(height=H, width=W, buffer_size=16)
    ht, wd = buf.ht, buf.wd
    for k in range(n):
        img = jnp.full((H, W, 3), k, jnp.uint8)
        fmap = jnp.full((ht, wd, 128), float(k), jnp.float32)
        net = jnp.full((ht, wd, 128), float(k), jnp.float32)
        inp = jnp.full((ht, wd, 128), float(k), jnp.float32)
        buf.append_keyframe(
            k * 10, img, fmap, net, inp,
            intrinsics=np.asarray([W, W, W / 2, H / 2], np.float32),
        )
        buf.disps = buf.disps.at[k].set(float(k + 1))
        buf.poses = buf.poses.at[k, 0].set(float(k))
    # initialized scratch row above n_frames (the speculative keep-branch
    # next-slot init)
    buf.disps = buf.disps.at[n].set(scratch_mark)
    buf.poses = buf.poses.at[n, 0].set(scratch_mark)
    return buf


class TestRemoveSlot:
    def test_second_newest_default(self):
        buf = _filled_buffer(n=6)
        buf.remove_slot(4)  # top defaults to n_frames-1 = 5
        assert buf.n_frames == 5
        d = np.asarray(buf.disps[:5, 0, 0])
        np.testing.assert_allclose(d, [1, 2, 3, 4, 6])  # old 5 -> slot 4
        assert list(buf.tstamp[:5]) == [0, 10, 20, 30, 50]

    def test_late_removal_shifts_scratch_row(self):
        buf = _filled_buffer(n=6, scratch_mark=99.0)
        # remove slot 3 AFTER a younger keyframe (slot 5) was appended and
        # the next scratch slot (6) initialized: top = 6
        buf.remove_slot(3, top=6)
        assert buf.n_frames == 5
        d = np.asarray(buf.disps[:6, 0, 0])
        # rows 4..6 shifted into 3..5; the scratch marker lands at slot 5
        np.testing.assert_allclose(d, [1, 2, 3, 5, 6, 99.0])
        p = np.asarray(buf.poses[:6, 0])
        np.testing.assert_allclose(p, [0, 1, 2, 4, 5, 99.0])
        assert list(buf.tstamp[:5]) == [0, 10, 20, 40, 50]

    def test_images_and_features_shift_together(self):
        buf = _filled_buffer(n=6)
        buf.remove_slot(2, top=6)
        img = np.asarray(buf.images[:5, 0, 0, 0])
        fm = np.asarray(buf.fmaps[:5, 0, 0, 0]).astype(np.float32)
        np.testing.assert_allclose(img, [0, 1, 3, 4, 5])
        np.testing.assert_allclose(fm, [0, 1, 3, 4, 5])


class TestRmKeyframeGraph:
    def test_edges_touching_removed_frame_drop_and_shift(self):
        buf = _filled_buffer(n=6)

        def update_fn(*a):  # never called here
            raise AssertionError

        update_fn.host_only = True
        g = FactorGraph(buf, update_fn, None, max_factors=16,
                        incremental=True)
        g.add_factors(np.asarray([0, 1, 3, 4, 5]),
                      np.asarray([1, 3, 4, 5, 2]))
        g.rm_keyframe(3, top=6)
        act = list(zip(g.ii[: g.n_edges].tolist(),
                       g.jj[: g.n_edges].tolist()))
        # edges (1,3), (3,4) dropped; indices > 3 shift down
        assert (0, 1) in act
        assert (3, 4) in act      # was (4, 5)
        assert (4, 2) in act      # was (5, 2)
        assert len(act) == 3
        assert buf.n_frames == 5
