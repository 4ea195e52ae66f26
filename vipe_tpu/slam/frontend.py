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
            # 'alt' stores packed features instead of materialized volumes
            # (~13x less edge state; lookups recompute windows on the fly —
            # pair with VIPE_PALLAS=1 on TPU for the fused kernel);
            # corr_dtype='int8' halves volume-mode edge state instead
            # (per-edge quantized volumes, dequant folded into lookups)
            corr_mode=config.get("corr_mode", "volume"),
            corr_dtype=config.get("corr_dtype", "bf16"),
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
        # 2 = depth-2 speculation (decision applied one keyframe late, reads
        # fully overlapped); 1 = resolve before the very next append
        # (reference-exact removal ordering, one blocking read per keyframe).
        # Rigs cap at 1: the late-removal machinery (GraphBuffer.remove_slot
        # with top, cross_view_idx shifting) is single-view only.
        self.spec_depth = c.get("keyframe_spec_depth", 2)
        if getattr(buffer, "n_views", 1) > 1:
            self.spec_depth = min(self.spec_depth, 1)
        # PRE-STEP proximity speculation: submit the distance matrix BEFORE
        # the fused frontend step (on pre-BA state, with the scratch slot
        # const-velocity-predicted in-program) so its transfer completes in
        # the shadow of the step's compute and the next keyframe's proximity
        # readback never blocks.  Distances are one-BA-step stale — only the
        # NMS edge PROPOSAL sees them; the keyframe-removal decision stays
        # exact (computed in-program post-BA).  False = reference-exact
        # post-step distances (one blocking fetch per keyframe).
        self.prox_spec = c.get("proximity_spec", True)
        self.n_prestep_submits = 0
        # speculative distance-matrix token: submitted at the end of one
        # keyframe, resolved at the next — hides the ~25 ms readback behind
        # the intervening frames' work.  Only valid while nothing else
        # mutates poses/disps (disabled with GT init poses; dropped when the
        # backend runs).
        self._dist_token = None
        # deferred keyframe-removal decisions: deque of (device distance
        # scalar, t1 at submit), at most 2 outstanding.  The fused step's
        # keep/remove branches already ran on-device; only the HOST
        # bookkeeping (topology shift on removal) waits for the readback.
        # DEPTH-2 SPECULATION: keyframe k's decision is applied just before
        # keyframe k+2's append — one keyframe later than the topology
        # strictly needs — so the scalar transfer completes in the shadow
        # of keyframe k+1's work and the resolve never blocks.  Keyframe
        # k+1 is meanwhile appended/optimized ASSUMING keep; on the rare
        # "remove" outcome the removal is applied late (see _resolve_one),
        # with the k+1 decision re-scored against the post-removal pair.
        self._pending = []
        self.n_removals = 0

    def drop_cached_distance(self):
        self._dist_token = None

    def resolve_pending(self, keep_newest: bool = False):
        """Apply deferred keyframe-removal decisions.

        ``keep_newest=True`` (the per-keyframe call) leaves the most recent
        pending deferred — its readback resolves one keyframe later, fully
        overlapped with useful work.  MUST run with ``keep_newest=False``
        before any backend run, pass 2, and final state reads."""
        if self.spec_depth < 2:
            keep_newest = False
        while self._pending and (not keep_newest or len(self._pending) > 1):
            self._resolve_one()

    def _slot_init(self):
        """Constant-velocity pose + mean-disp init for the scratch slot t1
        (host-side redo of the fused keep-branch; rare paths only)."""
        if not self.has_init_pose:
            self._init_pose()
        self.buffer.disps = _jitted_mean_disp_init(
            self.buffer.disps, jnp.int32(self.t1), self.buffer.n_views
        )

    def _resolve_one(self):
        d_dev, t1s = self._pending.pop(0)
        g = self.graph
        # at depth 1 ages were NOT bumped at submit (reference-exact mode):
        # finish applies the decision-dependent bump
        d = g.finish_fused_step(d_dev, self.iters1, self.iters2,
                                self.keyframe_thresh,
                                bump_ages=self.spec_depth < 2)
        if d >= self.keyframe_thresh:
            return
        self.n_removals += 1
        if self.t1 == t1s:
            # resolved before the next append (reference ordering)
            g.rm_second_newest_keyframe(t1s - 2)
            self.t1 = t1s - 1
            # the keep-branch slot init was skipped in-program; redo it for
            # the shifted t1 (rare path)
            self._slot_init()
            # the optimistic distance matrix indexed the removed frame —
            # resubmit against the compacted buffer
            self._dist_token = None
            self._submit_distance()
            return
        # LATE removal: keyframe t1s-2 was speculatively kept and a younger
        # keyframe appended + optimized since.  Remove it now, shifting
        # every row above — including the initialized scratch slot — down
        # one.  The extra optimization rounds that included the removed
        # (near-duplicate) keyframe are a benign speculative divergence from
        # the reference; in practice the keyframe SET converges to the same
        # frames, though a decision sitting exactly on keyframe_thresh can
        # flip (scored from the slightly different post-speculation state).
        # keyframe_spec_depth=1 restores reference-exact ordering.
        assert self.t1 == t1s + 1, (self.t1, t1s)
        g.rm_keyframe(t1s - 2, top=self.t1)
        self.t1 -= 1
        if self._pending:
            # the younger decision compared against the now-removed keyframe
            # (pair (t1s-2, t1s-1)); the reference pair after the removal is
            # (t1-3, t1-2) — re-score and re-decide (blocking; rare path)
            d_y_dev, _t1s_y = self._pending.pop(0)
            d_y_old = g.finish_fused_step(
                d_y_dev, self.iters1, self.iters2,
                self.keyframe_thresh,
                bump_ages=self.spec_depth < 2,
            )
            d_new = float(jnp.max(self.buffer.frame_distance(
                jnp.asarray([self.t1 - 3], jnp.int32),
                jnp.asarray([self.t1 - 2], jnp.int32),
                beta=self.beta, bidirectional=True,
            )))
            if d_new < self.keyframe_thresh:
                self.n_removals += 1
                g.rm_second_newest_keyframe(self.t1 - 2)
                self.t1 -= 1
                self._slot_init()
            elif d_y_old < self.keyframe_thresh:
                # the in-program branch (keyed on the stale pair) took the
                # remove branch and skipped the keep-branch iters2 rounds +
                # slot init; redo both so the kept keyframe is optimized
                # exactly like every other kept keyframe
                if g.n_edges > 0:
                    g.update_fused(self.iters2, use_inactive=True,
                                   fixed_motion=self.has_init_pose)
                    # update_fused re-ages by iters2, already counted by
                    # the optimistic submit-time bump
                    g.age[: g.n_edges] -= self.iters2
                self._slot_init()
        self._dist_token = None
        self._submit_distance()

    def _submit_distance(self, pre_step: bool = False):
        if not self.has_init_pose:
            if pre_step:
                self.n_prestep_submits += 1
            # +8 slack: t0 = t1-5 may reach below the window edge
            self._dist_token = self.graph.submit_distance_matrix(
                beta=self.beta, n_frames=self.buffer.n_frames + 1,
                window=self.frontend_window + 8,
                predict_slot=self.t1 if pre_step else None,
            )

    def _init_pose(self):
        """Constant-velocity prediction for the next slot (frontend.py:70-76)."""
        buf = self.buffer
        buf.poses = _jitted_const_velocity(buf.poses, jnp.int32(self.t1))

    def _update(self):
        """Per-new-keyframe update (frontend.py:78-124)."""
        assert len(self._pending) <= 1, (
            "resolve_pending(keep_newest=True) must run before the append"
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
            # PRE-STEP speculative distance submission: enqueued before the
            # fused step so it computes on pre-BA state and its transfer
            # rides the step's compute shadow (zero-blocking proximity
            # readback at the next keyframe).  V = 1 only: the rig distance
            # matrix has no predict_slot overlay, so rigs submit post-step.
            pre_spec = self.prox_spec and not self.has_init_pose and g.V == 1
            if pre_spec:
                self._submit_distance(pre_step=True)
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
            # optimistic age bump (assume keep): at depth 2 a younger
            # keyframe's rm_factors(age) may run before this decision
            # resolves, so ages must be current NOW.  On the rare remove,
            # surviving edges age iters2 extra — a third of a keyframe's
            # aging, noise against max_age=25.  Depth 1 resolves before the
            # next _update, so it keeps the reference-exact bump in
            # finish_fused_step instead.
            if self.spec_depth >= 2:
                g.age[: g.n_edges] += self.iters1 + self.iters2
            self._pending.append((d_dev, self.t1))
            if pre_spec:
                return  # pre-step token already submitted above
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
