"""Pass-2 interpolation of non-keyframe poses (reference
/root/reference/vipe/slam/components/inner_filler.py:46-138).

Non-keyframes are appended to the buffer after ``start_idx``; each chunk gets
a constant-velocity SE3 initialization between bracketing keyframes followed
by 10 motion-only GRU/BA rounds against the 2 nearest keyframes.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ..ops import lie
from .buffer import GraphBuffer
from .factor_graph import FactorGraph


@dataclass
class FilledReturn:
    poses: np.ndarray  # (T, 7) world-to-camera SE3 per original frame
    dense_disps: Optional[np.ndarray] = None


class InnerFiller:
    def __init__(self, buffer: GraphBuffer, update_fn, params, config):
        self.buffer = buffer
        self.update_fn = update_fn
        self.params = params
        self.config = config
        self.start_idx = -1
        self.filled_poses: List[np.ndarray] = []
        self.filled_disps: List[np.ndarray] = []

    def set_start_idx(self, start_idx: int):
        self.start_idx = start_idx

    def check(self) -> bool:
        assert self.start_idx >= 0
        return (
            self.buffer.n_frames - self.start_idx
            >= self.config.get("infill_chunk_size", 16)
        )

    def compute(self):
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
            poses=np.concatenate(self.filled_poses, axis=0),
            dense_disps=(
                np.concatenate(self.filled_disps, axis=0)
                if self.filled_disps else None
            ),
        )
