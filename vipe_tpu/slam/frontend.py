"""SLAM frontend: keyframe-incremental tracking (reference
/root/reference/vipe/slam/components/frontend.py:32-159).

Handles system initialization after ``warmup`` keyframes and the per-keyframe
update: proximity-edge proposal, iters1+iters2 GRU/BA rounds, removal of
too-close keyframes, constant-velocity pose prediction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import lie
from ..utils import jaxutil
from .buffer import GraphBuffer
from .factor_graph import FactorGraph


@functools.partial(jax.jit, donate_argnums=0)
def _jitted_const_velocity(poses, t1):
    """poses[t1] = exp(0.5·log(p[t1-1]·p[t1-2]⁻¹))·p[t1-1] in one dispatch."""
    p1 = poses[t1 - 2]
    p2 = poses[t1 - 1]
    w = lie.se3_log(lie.se3_mul(p2, lie.se3_inv(p1))) * 0.5
    return poses.at[t1].set(lie.se3_mul(lie.se3_exp(w), p2))


@functools.partial(jax.jit, donate_argnums=0, static_argnums=2)
def _jitted_mean_disp_init(disps, t1, V: int = 1):
    """disps[slots of frame t1] = mean(previous frame's slots), one donated
    dispatch.  disps is slot-flattened (frame·V + view) for rigs."""
    if V == 1:
        return disps.at[t1].set(jnp.mean(disps[t1 - 1]))
    prev = jax.lax.dynamic_slice_in_dim(disps, (t1 - 1) * V, V)
    fill = jnp.broadcast_to(jnp.mean(prev), prev.shape)
    return jax.lax.dynamic_update_slice_in_dim(disps, fill, t1 * V, 0)


class SLAMFrontend:
    def __init__(self, buffer: GraphBuffer, update_fn, params, config):
        self.buffer = buffer
        self.config = config
        self.graph = FactorGraph(
            buffer, update_fn, params, max_factors=48, incremental=True,
            optimize_intrinsics=config.get("optimize_intrinsics", False),
        )
        self.t1 = 0
        self.is_initialized = False
        self.max_age = 25
        self.iters1 = 4
        self.iters2 = 2

        c = config
        self.warmup = c.get("warmup", 8)
        self.beta = c.get("beta", 0.3)
        self.frontend_nms = c.get("frontend_nms", 1)
        self.keyframe_thresh = c.get("keyframe_thresh", 4.0)
        self.frontend_window = c.get("frontend_window", 25)
        self.frontend_thresh = c.get("frontend_thresh", 16.0)
        self.frontend_radius = c.get("frontend_radius", 2)
        self.seq_init = c.get("seq_init", True)
        self.has_init_pose = c.get("has_init_pose", False)
        # speculative distance-matrix token: submitted at the end of one
        # keyframe, resolved at the next — hides the ~25 ms readback behind
        # the intervening frames' work.  Only valid while nothing else
        # mutates poses/disps (disabled with GT init poses; dropped when the
        # backend runs).
        self._dist_token = None
        # deferred keyframe-removal decision: (device distance scalar,
        # t1 at submit).  The fused step's keep/remove branches already ran
        # on-device; only the HOST bookkeeping (edge ages, topology shift on
        # removal) waits for the readback, which resolve_pending() applies
        # just before the next state-dependent operation (next keyframe
        # append, backend run, pass-1 end).  This removes the per-keyframe
        # blocking sync from the tracking loop.
        self._pending = None
        self.n_removals = 0

    def drop_cached_distance(self):
        self._dist_token = None

    def resolve_pending(self):
        """Apply a deferred keyframe-removal decision.  MUST run before the
        next ``buffer.append_keyframe`` and before any backend run; no-op
        when nothing is pending."""
        if self._pending is None:
            return
        d_dev, t1s = self._pending
        self._pending = None
        g = self.graph
        d = g.finish_fused_step(d_dev, self.iters1, self.iters2,
                                self.keyframe_thresh)
        if d < self.keyframe_thresh:
            self.n_removals += 1
            g.rm_second_newest_keyframe(t1s - 2)
            self.t1 = t1s - 1
            # the keep-branch slot init was skipped in-program; redo it for
            # the shifted t1 (rare path)
            if not self.has_init_pose:
                self._init_pose()
            self.buffer.disps = _jitted_mean_disp_init(
                self.buffer.disps, jnp.int32(self.t1), self.buffer.n_views
            )
            # the optimistic distance matrix indexed the removed frame —
            # resubmit against the compacted buffer
            self._dist_token = None
            self._submit_distance()

    def _submit_distance(self):
        if not self.has_init_pose:
            # +8 slack: t0 = t1-5 may reach below the window edge
            self._dist_token = self.graph.submit_distance_matrix(
                beta=self.beta, n_frames=self.buffer.n_frames + 1,
                window=self.frontend_window + 8,
            )

    def _init_pose(self):
        """Constant-velocity prediction for the next slot (frontend.py:70-76)."""
        buf = self.buffer
        buf.poses = _jitted_const_velocity(buf.poses, jnp.int32(self.t1))

    def _update(self):
        """Per-new-keyframe update (frontend.py:78-124)."""
        assert self._pending is None, (
            "resolve_pending() must run before the keyframe append"
        )
        self.t1 += 1
        g = self.graph
        buf = self.buffer

        if g.n_edges > 0:
            g.rm_factors(g.age[: g.n_edges] > self.max_age, store=True)

        g.add_proximity_factors(
            self.t1 - 5,
            max(self.t1 - self.frontend_window, 0),
            rad=self.frontend_radius,
            nms=self.frontend_nms,
            thresh=self.frontend_thresh,
            beta=self.beta,
            remove=True,
            dist_token=self._dist_token,
        )
        self._dist_token = None

        if g.can_fuse_frontend_step:
            # ONE dispatch: iters1 rounds → removal distance → (cond) iters2
            # rounds + next-slot init.  The distance readback is DEFERRED:
            # resolve_pending() applies the host bookkeeping right before
            # the next state-dependent operation, so the tracking loop never
            # blocks on it here.
            d_dev = g.frontend_step_fused(
                self.iters1, self.iters2,
                d_pair=(self.t1 - 3, self.t1 - 2),
                kf_thresh=self.keyframe_thresh, beta=self.beta,
                slot_t1=self.t1, const_vel=not self.has_init_pose,
                fixed_motion=self.has_init_pose,
                defer=True,
            )
            self._pending = (d_dev, self.t1)
        else:
            g.update_fused(self.iters1, use_inactive=True,
                           fixed_motion=self.has_init_pose)
            d = buf.frame_distance(
                jnp.asarray([self.t1 - 3], jnp.int32),
                jnp.asarray([self.t1 - 2], jnp.int32),
                beta=self.beta, bidirectional=True,
            )
            if float(jnp.max(d)) < self.keyframe_thresh:
                self.n_removals += 1
                g.rm_second_newest_keyframe(self.t1 - 2)
                self.t1 -= 1
            else:
                g.update_fused(self.iters2, use_inactive=True,
                               fixed_motion=self.has_init_pose)
            if not self.has_init_pose:
                self._init_pose()
            buf.disps = _jitted_mean_disp_init(
                buf.disps, jnp.int32(self.t1), buf.n_views
            )
        self._submit_distance()

    def _initialize(self):
        """System init over the first ``warmup`` keyframes (frontend.py:126-148)."""
        g = self.graph
        buf = self.buffer
        self.t1 = buf.n_frames

        g.add_neighborhood_factors(0, self.t1, r=1 if self.seq_init else 3)
        g.update_fused(8, t0=1, use_inactive=True,
                       fixed_motion=self.has_init_pose)

        if not self.seq_init:
            g.add_proximity_factors(0, 0, rad=2, nms=2,
                                    thresh=self.frontend_thresh, remove=False)
            g.update_fused(8, t0=1, use_inactive=True,
                           fixed_motion=self.has_init_pose)

        if not self.has_init_pose:
            self._init_pose()
        V = buf.n_views
        buf.disps = jaxutil.set_rows(
            buf.disps, self.t1 * V,
            jnp.broadcast_to(
                jnp.mean(buf.disps[(self.t1 - 4) * V: self.t1 * V]),
                (V,) + buf.disps.shape[1:],
            ),
        )
        self.is_initialized = True
        g.rm_factors(g.ii[: g.n_edges] < self.warmup - 4, store=True)
        self._submit_distance()

    def run(self):
        if not self.is_initialized and self.buffer.n_frames == self.warmup:
            self._initialize()
        elif self.is_initialized and self.t1 < self.buffer.n_frames:
            self._update()
