"""SLAM backend: global BA over a freshly built proximity graph (reference
/root/reference/vipe/slam/components/backend.py:32-122)."""

from __future__ import annotations

import jax.numpy as jnp

from .buffer import GraphBuffer
from .factor_graph import FactorGraph


class SLAMBackend:
    def __init__(self, buffer: GraphBuffer, update_fn, params, config):
        self.buffer = buffer
        self.update_fn = update_fn
        self.params = params
        self.config = config
        self.depth_model = None
        self.last_residual = 0.0

    def run(self, steps: int = 12, update_depth: bool = True):
        """Fresh graph + ``steps`` × update_batch (backend.py:75-110)."""
        c = self.config
        buf = self.buffer
        t = buf.n_frames
        graph = FactorGraph(
            buf, self.update_fn, self.params,
            max_factors=16 * t, incremental=False,
            # alt: fused chunks pack features instead of materializing the
            # per-chunk corr-volume transient (state itself is not stored
            # on the backend path either way)
            corr_mode=c.get("corr_mode", "volume"),
        )
        graph.add_proximity_factors(
            rad=c.get("backend_radius", 2),
            nms=c.get("backend_nms", 3),
            thresh=c.get("backend_thresh", 22.0),
            beta=c.get("beta", 0.3),
        )

        optimize_intrinsics = c.get("optimize_intrinsics", False)
        more_iters = optimize_intrinsics
        itrs = 16 if more_iters else 8

        if graph.n_edges > 0:
            if self.depth_model is not None and update_depth and optimize_intrinsics:
                pre = steps // 2
                graph.update_batch(itrs=itrs, steps=pre,
                                   optimize_intrinsics=optimize_intrinsics)
                buf.update_disps_sens(self.depth_model, frame_idx=None)
                graph.update_batch(itrs=itrs, steps=steps - pre,
                                   optimize_intrinsics=False)
            else:
                graph.update_batch(itrs=itrs, steps=steps,
                                   optimize_intrinsics=optimize_intrinsics)
            self.last_residual = graph.current_residual()
        else:
            # single keyframe: adopt sensor depth directly (backend.py:104-109)
            buf.disps = buf.disps.at[0].set(
                jnp.where(buf.disps_sens[0] > 0, buf.disps_sens[0], buf.disps[0])
            )

    def run_if_necessary(self, steps: int = 12):
        if self.config.get("optimize_intrinsics", False) or self.config.get(
            "optimize_rig_rotation", False
        ):
            self.run(steps=steps, update_depth=True)
