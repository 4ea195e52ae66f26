"""Pass-2 interpolation of non-keyframe poses (reference
/root/reference/vipe/slam/components/inner_filler.py:46-138).

Non-keyframes are appended to the buffer after ``start_idx``; each chunk gets
a constant-velocity SE3 initialization between bracketing keyframes followed
by 10 motion-only GRU/BA rounds against the 2 nearest keyframes.

Fast path: the ENTIRE chunk computation — const-velocity init, target
initialization from reprojection, on-the-fly corr pyramids, 10 fused
GRU+BA rounds — is ONE compiled program returning just the (F, 7) infill
poses.  Nothing writes back into the graph buffer (the rounds are
motion-only over throwaway rows), and the result readback is deferred to
``get_result`` so pass 2 never blocks on the device.  The generic
FactorGraph path (per-chunk graph build: ~20 programs + a blocking readback
over the remote tunnel) remains as the fallback for oracle update_fns,
multi-view rigs, sparse tracks and dense-disp infill.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import cameras as cam
from ..ops import corr as corr_ops
from ..ops import geom, lie
from .buffer import GraphBuffer, bucket_size
from .factor_graph import (
    CORR_DTYPE,
    CORR_LEVELS,
    FactorGraph,
    _make_round_runner,
)
from . import ba


@dataclass
class FilledReturn:
    poses: np.ndarray  # (T, 7) world-to-camera SE3 per original frame
    dense_disps: Optional[np.ndarray] = None


@functools.lru_cache(maxsize=None)
def _jitted_filler_compute(update_fn, cfg, rounds: int,
                           corr_alt: bool = False):
    """One dispatch per infill chunk: const-velocity init → target init →
    corr pyramid build → ``rounds`` fused motion-only GRU+BA rounds →
    gather the infill poses.  Window-relative indices (``base`` subtracted
    by the caller)."""
    camera_type = cfg.camera_type

    @functools.partial(jax.jit, static_argnums=(1,))
    def run(params, Nb, poses, disps, intr, fmaps, nets, inps, masks,
            tstamp, infill_rows, t0i, t1i, m_valid,
            ii_e, jj_e, ev, slot_edge, src_rows, pose_mask,
            itrs):
        ht, wd = disps.shape[-2:]
        P = ht * wd

        # constant-velocity init (reference inner_filler.py:70-84)
        p0 = poses[t0i]
        p1 = poses[t1i]
        dp = lie.se3_mul(p1, lie.se3_inv(p0))
        dt = (tstamp[t1i] - tstamp[t0i]) + 1e-3
        vel = lie.se3_log(dp) / dt[:, None]
        w = vel * (tstamp[infill_rows] - tstamp[t0i])[:, None]
        m_pose = lie.se3_mul(lie.se3_exp(w), p0)
        m_pose = jnp.where(m_valid[:, None], m_pose, poses[infill_rows])
        poses = poses.at[infill_rows].set(m_pose)

        # add_factors semantics: target = current reprojection, weight = 0,
        # hidden state from the source frame's context encoding
        intr_grid = cam.scaled_intrinsics(camera_type, intr, 1.0 / 8.0)
        coords0, _ = geom.reproject(
            poses, disps, intr_grid, camera_type, ii_e, jj_e
        )
        target = coords0
        f_net = nets[ii_e].astype(jnp.float32)

        if corr_alt:
            # packed features — the chunk's Eb·P² volume transient never
            # exists (windows recomputed at lookup, Pallas on TPU)
            pyr = corr_ops.corr_feat_pack(
                fmaps[ii_e].astype(jnp.float32),
                fmaps[jj_e].astype(jnp.float32), CORR_LEVELS,
            )
        else:
            pyr = [
                p.astype(CORR_DTYPE)
                for p in corr_ops.corr_pyramid(
                    fmaps[ii_e].astype(jnp.float32),
                    fmaps[jj_e].astype(jnp.float32), CORR_LEVELS,
                )
            ]

        damping = jnp.concatenate(
            [jnp.full((Nb, ht, wd), 1e-6, jnp.float32),
             jnp.zeros((1, ht, wd), jnp.float32)], 0
        )
        empty = jnp.zeros((0, ht, wd, 2), jnp.float32)
        runner = _make_round_runner(
            update_fn, cfg, params, Nb, pyr, inps, masks,
            ii_e, jj_e, ev, empty, empty,
            ii_e, jj_e, ev, slot_edge, src_rows,
            pose_mask, jnp.zeros(Nb, bool),  # motion-only: no disp updates
            jnp.zeros((Nb, P), jnp.float32), itrs,
            jnp.float32(1e-3), jnp.float32(0.1),
        )
        state = (poses, disps, intr, f_net, target,
                 jnp.zeros_like(target), damping)
        state = runner(state, rounds)
        return state[0][infill_rows]

    return run


class InnerFiller:
    def __init__(self, buffer: GraphBuffer, update_fn, params, config):
        self.buffer = buffer
        self.update_fn = update_fn
        self.params = params
        self.config = config
        self.start_idx = -1
        self.filled_poses: List = []  # numpy or device arrays per chunk
        self.filled_disps: List[np.ndarray] = []

    def set_start_idx(self, start_idx: int):
        self.start_idx = start_idx

    def check(self) -> bool:
        assert self.start_idx >= 0
        return (
            self.buffer.n_frames - self.start_idx
            >= self.config.get("infill_chunk_size", 16)
        )

    @property
    def _can_fuse(self) -> bool:
        buf = self.buffer
        st = getattr(buf, "sparse_tracks", None)
        # V == 1: _jitted_filler_compute is a single-view program (direct
        # frame-indexed buffers); rigs take _compute_loop, whose
        # update_fused now runs the FUSED mv rounds (one dispatch per
        # chunk) rather than the old per-round loop
        return (
            not getattr(self.update_fn, "host_only", False)
            and getattr(buf, "n_views", 1) == 1
            and (st is None or not st.enabled)
            and not self.config.get("infill_dense_disp", False)
        )

    @property
    def needs_context(self) -> bool:
        """False when the fused path will run: infill rows' context
        encodings (nets/inps) are never read there — GRU sources are always
        keyframe rows — so pass 2 may skip the context encoder for
        non-keyframe frames."""
        return not self._can_fuse

    def compute(self):
        if self._can_fuse:
            self._compute_fused()
        else:
            self._compute_loop()

    def _compute_fused(self):
        buf = self.buffer
        total = buf.n_frames
        s = self.start_idx
        chunk = self.config.get("infill_chunk_size", 16)

        m_t = buf.tstamp[s:total]
        n_t = buf.tstamp[:s]
        t0 = np.searchsorted(n_t, m_t, side="right") - 1
        t0 = np.clip(t0, 0, s - 1)
        t1 = np.where(t0 < s - 1, t0 + 1, t0)

        # window: the program only needs rows [base, total)
        base = int(t0.min())
        Nb = bucket_size(total - base)
        base = max(min(base, buf.buffer_size - Nb), 0)

        F = total - s
        Fb = bucket_size(F, minimum=min(chunk, 16))
        infill_rows = np.full(Fb, s - base, np.int64)
        infill_rows[:F] = np.arange(s, total) - base
        m_valid = np.zeros(Fb, bool)
        m_valid[:F] = True
        t0w = np.full(Fb, t0[0] - base, np.int64)
        t0w[:F] = t0 - base
        t1w = np.full(Fb, t1[0] - base, np.int64)
        t1w[:F] = t1 - base

        # edges {t0, t1} → infill, deduped (t0 == t1 at the sequence edges)
        pairs = np.unique(np.stack([
            np.concatenate([t0w[:F], t1w[:F]]),
            np.concatenate([infill_rows[:F], infill_rows[:F]]),
        ], axis=1), axis=0)
        E = len(pairs)
        Eb = bucket_size(E, minimum=min(2 * chunk, 16))
        ii_e = np.zeros(Eb, np.int64)
        jj_e = np.zeros(Eb, np.int64)
        ii_e[:E] = pairs[:, 0]
        jj_e[:E] = pairs[:, 1]
        ev = np.arange(Eb) < E

        fill = np.bincount(ii_e[:E], minlength=Nb).max()
        M = bucket_size(int(fill), minimum=8)
        slot_edge = np.full((Nb, M), Eb, np.int32)
        fill_ct = np.zeros(Nb, np.int64)
        for e in range(E):
            i = ii_e[e]
            slot_edge[i, fill_ct[i]] = e
            fill_ct[i] += 1

        src = np.unique(ii_e[:E])
        src_rows = np.full(Nb, Nb, np.int64)
        src_rows[: len(src)] = src

        idx = np.arange(Nb) + base
        pose_mask = (idx >= s) & (idx < total)

        cfg = ba.BAConfig(
            camera_type=buf.camera_type, ht=buf.ht, wd=buf.wd,
            optimize_intrinsics=False, alpha=buf.dense_disp_alpha,
            max_edges_per_frame=M,
        )
        b = base
        run = _jitted_filler_compute(
            self.update_fn, cfg, 10,
            self.config.get("corr_mode", "volume") == "alt",
        )
        out = run(
            self.params, Nb, buf.poses[b: b + Nb], buf.disps[b: b + Nb],
            buf.intrinsics, buf.fmaps[b: b + Nb], buf.nets[b: b + Nb],
            buf.inps[b: b + Nb], buf.masks[b: b + Nb],
            jnp.asarray(buf.tstamp[b: b + Nb], jnp.float32),
            jnp.asarray(infill_rows, jnp.int32),
            jnp.asarray(t0w, jnp.int32), jnp.asarray(t1w, jnp.int32),
            jnp.asarray(m_valid),
            jnp.asarray(ii_e, jnp.int32), jnp.asarray(jj_e, jnp.int32),
            jnp.asarray(ev), jnp.asarray(slot_edge),
            jnp.asarray(src_rows, jnp.int32), jnp.asarray(pose_mask),
            jnp.int32(3),
        )
        out = out[:F]
        try:  # overlap the readback with the next chunk's work
            out.copy_to_host_async()
        except Exception:
            pass
        self.filled_poses.append(out)
        buf.n_frames = s

    def _compute_loop(self):
        buf = self.buffer
        total = buf.n_frames
        s = self.start_idx
        infill_disp = self.config.get("infill_dense_disp", False)

        m_t = buf.tstamp[s:total]
        n_t = buf.tstamp[:s]

        t0 = np.searchsorted(n_t, m_t, side="right") - 1
        t0 = np.clip(t0, 0, s - 1)
        t1 = np.where(t0 < s - 1, t0 + 1, t0)

        d_time = (n_t[t1] - n_t[t0]).astype(np.float32) + 1e-3
        poses_kf = buf.poses[:s]
        dp = lie.se3_mul(poses_kf[t1], lie.se3_inv(poses_kf[t0]))
        vel = lie.se3_log(dp) / d_time[:, None]
        w = vel * (m_t - n_t[t0]).astype(np.float32)[:, None]
        m_pose = lie.se3_mul(lie.se3_exp(w), poses_kf[t0])
        buf.poses = buf.poses.at[s:total].set(m_pose)

        V = getattr(buf, "n_views", 1)
        if infill_disp:
            t0v = (t0[:, None] * V + np.arange(V)).reshape(-1)
            sv, totv = s * V, total * V
            mean_d = jnp.mean(buf.disps[t0v], axis=(1, 2), keepdims=True)
            init = jnp.broadcast_to(mean_d, buf.disps[sv:totv].shape)
            init = jnp.where(buf.disps_sens[sv:totv] > 0,
                             buf.disps_sens[sv:totv], init)
            buf.disps = buf.disps.at[sv:totv].set(init)

        graph = FactorGraph(
            buf, self.update_fn, self.params,
            max_factors=4 * (total - s), incremental=True,
            corr_dtype=self.config.get("corr_dtype", "bf16"),
        )
        infill = np.arange(s, total)
        graph.add_factors(t0, infill)
        graph.add_factors(t1, infill)
        if infill_disp:
            graph.add_factors(infill, t0)
            graph.add_factors(infill, t1)

        # 10 motion-only rounds fused into one dispatch (falls back to the
        # per-round loop for oracle update_fns / rigs / trackers)
        graph.update_fused(10, s, total, motion_only=not infill_disp,
                           limited_disp=True)

        self.filled_poses.append(np.asarray(buf.poses[s:total]))
        if infill_disp:
            self.filled_disps.append(np.asarray(buf.disps[s * V: total * V]))
        buf.n_frames = s

    def get_result(self) -> FilledReturn:
        return FilledReturn(
            poses=np.concatenate(
                [np.asarray(p) for p in self.filled_poses], axis=0
            ),
            dense_disps=(
                np.concatenate(self.filled_disps, axis=0)
                if self.filled_disps else None
            ),
        )
