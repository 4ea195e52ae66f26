"""Factor graph: host-side edge topology + jitted RAFT-GRU/BA update steps.

TPU-native redesign of the reference ``FactorGraph``
(/root/reference/vipe/slam/components/factor_graph.py:39-495).  The reference
mutates variable-length torch tensors per edge operation; here every device
array is padded to ``max_factors`` with an ``n_edges`` watermark, so the two
hot compiled programs — the GRU update step and the BA solve — have constant
shapes regardless of topology churn.  Edge bookkeeping (dedup, age eviction,
NMS proposal) stays in plain numpy on the host, exactly where the reference
keeps it, and only index arrays cross into jit.

The learned update operator is injected as ``update_fn(params, net, inp,
corr, motn, ii, jj, num_frames)`` so tests can swap DroidNet for a geometric
oracle (see tests/test_slam_system.py); DroidNet ignores ``jj``.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import corr as corr_ops
from ..ops import geom
from ..utils import jaxutil
from . import ba
from .buffer import GraphBuffer, bucket_size

CORR_LEVELS = 4
CORR_RADIUS = 3
BACKEND_CHUNK = 32  # edges per alt-corr chunk in update_batch
ADD_CHUNK = 16      # edges per corr-volume build (bounds transient HBM)
CORR_DTYPE = jnp.bfloat16  # stored volumes (reference keeps fp16 via autocast)


@functools.partial(jax.jit, static_argnums=0)
def _jitted_edge_corr(levels, fmaps, ii, jj):
    """Per-edge correlation pyramid (one compiled program per batch bucket)."""
    f1 = fmaps[ii].astype(jnp.float32)
    f2 = fmaps[jj].astype(jnp.float32)
    pyr = corr_ops.corr_pyramid(f1, f2, levels)
    return [p.astype(CORR_DTYPE) for p in pyr]


@functools.lru_cache(maxsize=None)
def _jitted_gru_step(update_fn, camera_type):
    """Fused frontend GRU step: reproject + corr lookup + motion features +
    update network + weight masking, one compiled program per (E, Nb) shape.
    Eagerly this is ~300 small remote ops per call (~0.2 s over the TPU
    tunnel); fused it is one dispatch."""

    @functools.partial(jax.jit, static_argnums=(1,))
    def step(params, num_frames, poses, disps, intr_grid, corr_pyr, target,
             f_net, inps, masks, ii, jj, edge_valid):
        coords1, _ = geom.reproject(poses, disps, intr_grid, camera_type, ii, jj)
        corr_feat = corr_ops.corr_lookup_pyramid(
            [p.astype(jnp.float32) for p in corr_pyr], coords1, CORR_RADIUS
        )
        ht, wd = disps.shape[-2:]
        u, v = jnp.meshgrid(
            jnp.arange(wd, dtype=jnp.float32),
            jnp.arange(ht, dtype=jnp.float32), indexing="xy",
        )
        grid = jnp.stack([u, v], axis=-1)
        motn = jnp.concatenate(
            [coords1 - grid, target - coords1], axis=-1
        ).clip(-64.0, 64.0)
        inp = inps[ii].astype(jnp.float32)
        ix = jnp.where(edge_valid, ii, num_frames).astype(jnp.int32)
        net, delta, weight, eta = update_fn(
            params, f_net, inp, corr_feat, motn, ix, jj, num_frames + 1
        )
        bad = masks[ii][..., None] | (~edge_valid)[:, None, None, None]
        weight = jnp.where(bad, 0.0, weight)
        new_target = coords1 + delta
        return net, new_target, weight, eta[:num_frames]

    return step


@functools.partial(jax.jit, static_argnums=0)
def _jitted_distance_matrix(n, poses, disps, intrinsics, beta):
    """Full n×n BIDIRECTIONAL frame-distance matrix — ONE compile per frame
    bucket instead of one per unique pair-count (the reference computes
    exactly the pairs it needs, which on TPU would retrace every keyframe).

    Entry (i, j) of the one-directional matrix D is d(i→j, disp_i); the
    reference's bidirectional metric (buffer.py:577-591) is
    0.5·(d(i→j, disp_i) + d(j→i, disp_j)) = 0.5·(D + Dᵀ), each direction
    saturating to 1000 independently before the average."""
    ii, jj = jnp.meshgrid(jnp.arange(n), jnp.arange(n), indexing="ij")
    d = geom.frame_distance(
        poses, disps, intrinsics, ii.reshape(-1), jj.reshape(-1),
        di=ii.reshape(-1), beta=beta,
    ).reshape(n, n)
    return 0.5 * (d + d.T)


class FactorGraph:
    def __init__(
        self,
        buffer: GraphBuffer,
        update_fn: Callable,
        params,
        max_factors: int,
        incremental: bool,
        ba_cfg_kwargs: Optional[dict] = None,
        optimize_intrinsics: bool = False,
    ):
        self.buffer = buffer
        self.update_fn = update_fn
        self.params = params
        self.max_factors = max_factors
        self.incremental = incremental
        self.ba_cfg_kwargs = dict(ba_cfg_kwargs or {})
        # reference buffer.bundle_adjustment adds the intrinsics group
        # whenever configured — frontend updates included (buffer.py:496-499)
        self.optimize_intrinsics = optimize_intrinsics

        E = max_factors
        ht, wd = buffer.ht, buffer.wd
        self.ht, self.wd = ht, wd
        self.corr_levels = CORR_LEVELS
        self.n_edges = 0
        self.ii = np.zeros(E, np.int64)
        self.jj = np.zeros(E, np.int64)
        self.age = np.zeros(E, np.int64)

        # E+1 rows: row E is a scratch slot — add_factors pads its batches to
        # power-of-two buckets (constant shapes → no recompile per batch size)
        # and routes the padding writes there
        self.target = jnp.zeros((E + 1, ht, wd, 2), jnp.float32)
        self.weight = jnp.zeros((E + 1, ht, wd, 2), jnp.float32)
        self.f_net = jnp.zeros((E + 1, ht, wd, 128), jnp.float32)

        if incremental:
            self.corr_pyr = [
                jnp.zeros(
                    (E + 1, ht, wd) + corr_ops.level_dims(ht, wd, l), CORR_DTYPE
                )
                for l in range(self.corr_levels)
            ]
        else:
            self.corr_pyr = None

        # per-frame GRU-predicted BA damping (reference factor_graph.py:76)
        self.damping = jnp.full(
            (buffer.buffer_size, ht, wd), 1e-6, jnp.float32
        )

        # inactive (stored) factors (reference :89-94): indices on the host,
        # target/weight stay ON DEVICE — round-tripping them per BA call
        # costs ~1 s/keyframe once a few hundred edges accumulate
        self.ii_inac = np.zeros((0,), np.int64)
        self.jj_inac = np.zeros((0,), np.int64)
        self.target_inac = jnp.zeros((0, ht, wd, 2), jnp.float32)
        self.weight_inac = jnp.zeros((0, ht, wd, 2), jnp.float32)

    # ------------------------------------------------------------ edge admin

    def _edge_set(self):
        return set(zip(self.ii[: self.n_edges], self.jj[: self.n_edges])) | set(
            zip(self.ii_inac, self.jj_inac)
        )

    def add_factors(self, ii, jj, remove: bool = False):
        """Add edges (reference factor_graph.py:120-174): dedup, optionally
        evict oldest to respect max_factors, build per-edge corr volumes,
        init target from current reprojection, weight 0, hidden from source."""
        ii = np.asarray(ii, np.int64).reshape(-1)
        jj = np.asarray(jj, np.int64).reshape(-1)
        eset = self._edge_set()
        keep = [k for k in range(len(ii)) if (ii[k], jj[k]) not in eset
                and (ii[k], jj[k]) not in set(zip(ii[:k], jj[:k]))]
        ii, jj = ii[keep], jj[keep]
        if len(ii) == 0:
            return

        if (
            self.max_factors > 0
            and self.n_edges + len(ii) > self.max_factors
            and self.incremental
            and remove
        ):
            n_remove = self.n_edges + len(ii) - self.max_factors
            order = np.argsort(-self.age[: self.n_edges], kind="stable")
            mask = np.zeros(self.n_edges, bool)
            mask[order[:n_remove]] = True
            self.rm_factors(mask, store=True)

        space = self.max_factors - self.n_edges
        if len(ii) > space:
            ii, jj = ii[:space], jj[:space]
        if len(ii) == 0:
            return

        k = len(ii)
        start = self.n_edges
        self.ii[start: start + k] = ii
        self.jj[start: start + k] = jj
        self.age[start: start + k] = 0

        # pad each batch to a power-of-two bucket (≤ ADD_CHUNK) so compute +
        # scatter shapes repeat across calls; padding rows land in the scratch
        # slot E.  Chunking bounds the transient HBM of the volume build.
        for c0 in range(0, k, ADD_CHUNK):
            ci = ii[c0: c0 + ADD_CHUNK]
            cj = jj[c0: c0 + ADD_CHUNK]
            kc = len(ci)
            kb = bucket_size(kc, minimum=4)
            ii_pad = np.concatenate([ci, np.full(kb - kc, ci[-1])])
            jj_pad = np.concatenate([cj, np.full(kb - kc, cj[-1])])
            rows = np.full(kb, self.max_factors, np.int32)
            rows[:kc] = np.arange(start + c0, start + c0 + kc)

            ii_d = jnp.asarray(ii_pad, jnp.int32)
            jj_d = jnp.asarray(jj_pad, jnp.int32)
            rows_d = jnp.asarray(rows, jnp.int32)
            coords, _ = self.buffer.reproject(ii_d, jj_d)
            self.target = jaxutil.set_rows_at(self.target, rows_d, coords)
            self.weight = jaxutil.set_rows_at(
                self.weight, rows_d, jnp.zeros_like(coords)
            )
            self.f_net = jaxutil.set_rows_at(
                self.f_net, rows_d, self.buffer.nets[ii_d].astype(jnp.float32)
            )
            if self.incremental:
                pyr = _jitted_edge_corr(
                    self.corr_levels, self.buffer.fmaps, ii_d, jj_d
                )
                for l in range(self.corr_levels):
                    self.corr_pyr[l] = jaxutil.set_rows_at(
                        self.corr_pyr[l], rows_d, pyr[l]
                    )
        self.n_edges += k

    def rm_factors(self, mask, store: bool = False):
        """Drop edges, optionally storing them as inactive (reference :176-204)."""
        mask = np.asarray(mask, bool)
        if mask.shape[0] < self.max_factors:
            mask = np.concatenate(
                [mask, np.zeros(self.max_factors - mask.shape[0], bool)]
            )
        mask[self.n_edges:] = False
        if not mask.any():
            return
        drop = np.where(mask)[0]
        keep = np.where(~mask[: self.n_edges])[0]

        if store:
            self.ii_inac = np.concatenate([self.ii_inac, self.ii[drop]])
            self.jj_inac = np.concatenate([self.jj_inac, self.jj[drop]])
            drop_d = jnp.asarray(drop, jnp.int32)
            self.target_inac = jnp.concatenate(
                [self.target_inac, self.target[drop_d]], axis=0
            )
            self.weight_inac = jnp.concatenate(
                [self.weight_inac, self.weight[drop_d]], axis=0
            )

        perm = np.concatenate([
            keep, drop, np.arange(self.n_edges, self.max_factors + 1)
        ])
        self.ii[: len(keep)] = self.ii[keep]
        self.jj[: len(keep)] = self.jj[keep]
        self.age[: len(keep)] = self.age[keep]
        self.target = jaxutil.permute_rows(self.target, perm)
        self.weight = jaxutil.permute_rows(self.weight, perm)
        self.f_net = jaxutil.permute_rows(self.f_net, perm)
        if self.incremental:
            for l in range(self.corr_levels):
                self.corr_pyr[l] = jaxutil.permute_rows(self.corr_pyr[l], perm)
        self.n_edges = len(keep)

    def rm_second_newest_keyframe(self, ix: int):
        """Remove keyframe ix (= n_frames-2) from buffer and graph, shifting
        indices (reference :205-230)."""
        self.buffer.remove_second_newest()

        m = (self.ii_inac == ix) | (self.jj_inac == ix)
        self.ii_inac[self.ii_inac >= ix] -= 1
        self.jj_inac[self.jj_inac >= ix] -= 1
        if m.any():
            keep_d = jnp.asarray(np.where(~m)[0], jnp.int32)
            self.ii_inac = self.ii_inac[~m]
            self.jj_inac = self.jj_inac[~m]
            self.target_inac = self.target_inac[keep_d]
            self.weight_inac = self.weight_inac[keep_d]

        m = (self.ii[: self.n_edges] == ix) | (self.jj[: self.n_edges] == ix)
        self.ii[self.ii >= ix] -= 1
        self.jj[self.jj >= ix] -= 1
        self.rm_factors(m, store=False)

    # ---------------------------------------------------------- edge proposal

    def add_neighborhood_factors(self, t0: int, t1: int, r: int = 3):
        """All ordered pairs within radius r (reference :397-411)."""
        ii, jj = np.meshgrid(np.arange(t0, t1), np.arange(t0, t1), indexing="ij")
        ii, jj = ii.reshape(-1), jj.reshape(-1)
        keep = (np.abs(ii - jj) > 0) & (np.abs(ii - jj) <= r)
        self.add_factors(ii[keep], jj[keep])

    def add_proximity_factors(
        self,
        t0: int = 0,
        t1: int = 0,
        rad: int = 2,
        nms: int = 2,
        beta: float = 0.25,
        thresh: float = 16.0,
        remove: bool = False,
    ):
        """Distance-thresholded NMS edge proposal (reference :412-488).

        Neighborhood edges (i-rad-1..i-1 → i, bidirectional) are always added;
        remaining candidate pairs are sorted by frame distance and greedily
        accepted with an L1-ball NMS suppression around accepted edges.
        """
        t = self.buffer.n_frames
        if t - max(t0, t1) <= 0:
            return
        buf = self.buffer
        Nb = bucket_size(t)
        d_full = np.asarray(_jitted_distance_matrix(
            Nb, buf.poses[:Nb], buf.disps[:Nb],
            jnp.broadcast_to(buf.pinhole_grid_intrinsics, (Nb, 4)),
            jnp.float32(beta),
        )).astype(np.float64)
        ix = np.arange(t0, t)
        jx = np.arange(t1, t)
        ii, jj = np.meshgrid(ix, jx, indexing="ij")
        ii, jj = ii.reshape(-1), jj.reshape(-1)
        d = d_full[t0:t, t1:t].copy()
        n_i, n_j = t - t0, t - t1

        def _suppress(i, j):
            if t0 <= i < t and t1 <= j < t:
                d[i - t0, j - t1] = np.inf

        def _suppress_nms(i, j):
            for di in range(-nms, nms + 1):
                for dj in range(-nms, nms + 1):
                    if abs(di) + abs(dj) <= max(min(abs(i - j) - 2, nms), 0):
                        _suppress(i + di, j + dj)

        for i, j in zip(self.ii[: self.n_edges], self.jj[: self.n_edges]):
            _suppress_nms(int(i), int(j))
        for i, j in zip(self.ii_inac, self.jj_inac):
            _suppress_nms(int(i), int(j))

        flat = d.reshape(-1)
        mask_bad = (ii - rad < jj) | (flat > thresh)
        flat[mask_bad] = np.inf
        d_sorted = np.argsort(flat)

        es = []
        for i in range(t0, t):
            for j in range(max(i - rad - 1, 0), i):
                es.append((i, j))
                es.append((j, i))
                _suppress(i, j)

        for k in d_sorted:
            if flat[k] > thresh or not np.isfinite(d.reshape(-1)[k]):
                continue
            if self.max_factors > 0 and len(es) > self.max_factors:
                break
            i, j = int(ii[k]), int(jj[k])
            es.append((i, j))
            es.append((j, i))
            _suppress_nms(i, j)

        if es:
            es = np.asarray(es, np.int64)
            self.add_factors(es[:, 0], es[:, 1], remove)

    # ------------------------------------------------------------- GRU + BA

    def _active_arrays(self):
        E = self.max_factors
        ii = jnp.asarray(np.where(np.arange(E) < self.n_edges, self.ii, 0), jnp.int32)
        jj = jnp.asarray(np.where(np.arange(E) < self.n_edges, self.jj, 0), jnp.int32)
        ev = jnp.asarray(np.arange(E) < self.n_edges)
        return ii, jj, ev

    def _grid(self):
        return jnp.stack(
            jnp.meshgrid(
                jnp.arange(self.wd, dtype=jnp.float32),
                jnp.arange(self.ht, dtype=jnp.float32),
                indexing="xy",
            ),
            axis=-1,
        )

    def _run_update_fn(self, f_net, coords1, target_prev, ii_d, jj_d,
                       edge_valid, corr_feat, Nb):
        """Shared GRU update: motion features → update_fn → target/weight.

        Padded edges are routed to a trash aggregation segment (index Nb) so
        they cannot pollute the per-frame damping mean.
        """
        motn = jnp.concatenate(
            [coords1 - self._grid(), target_prev - coords1], axis=-1
        ).clip(-64.0, 64.0)

        inp = self.buffer.inps[ii_d].astype(jnp.float32)
        ix = jnp.where(edge_valid, ii_d, Nb).astype(jnp.int32)
        net, delta, weight, eta = self.update_fn(
            self.params, f_net, inp, corr_feat, motn, ix, jj_d, Nb + 1
        )
        bad = self.buffer.masks[ii_d][..., None] | (~edge_valid)[:, None, None, None]
        weight = jnp.where(bad, 0.0, weight)
        target = coords1 + delta
        return net, target, weight, eta[:Nb]

    def update(
        self,
        t0: Optional[int] = None,
        t1: Optional[int] = None,
        itrs: int = 3,
        use_inactive: bool = False,
        motion_only: bool = False,
        fixed_motion: bool = False,
        limited_disp: bool = False,
    ):
        """Frontend-style update (reference :231-316): reproject → corr lookup
        → ConvGRU → dense BA with GRU-predicted damping."""
        assert self.incremental and self.n_edges > 0
        act_ii = self.ii[: self.n_edges]
        act_jj = self.jj[: self.n_edges]
        if t0 is None:
            t0 = int(max(1, act_ii.min() + 1))
        if t1 is None:
            t1 = int(max(act_ii.max(), act_jj.max()) + 1)

        E = self.max_factors
        ii_d, jj_d, ev = self._active_arrays()
        Nb = bucket_size(self.buffer.n_frames)
        buf = self.buffer
        if getattr(self.update_fn, "host_only", False):
            coords1, _ = buf.reproject(ii_d, jj_d)
            corr_feat = corr_ops.corr_lookup_pyramid(
                [p[:E].astype(jnp.float32) for p in self.corr_pyr],
                coords1, CORR_RADIUS,
            )
            net, target, weight, eta = self._run_update_fn(
                self.f_net[:E], coords1, self.target[:E], ii_d, jj_d, ev,
                corr_feat, Nb,
            )
        else:
            step = _jitted_gru_step(self.update_fn, buf.camera_type)
            net, target, weight, eta = step(
                self.params, Nb, buf.poses[:Nb], buf.disps[:Nb],
                buf.scaled_intrinsics, [p[:E] for p in self.corr_pyr],
                self.target[:E], self.f_net[:E], buf.inps[:Nb],
                buf.masks[:Nb], ii_d, jj_d, ev,
            )
        self.f_net = jaxutil.set_prefix(self.f_net, net)
        self.target = jaxutil.set_prefix(self.target, target)
        self.weight = jaxutil.set_prefix(self.weight, weight)
        # overwrite damping rows for source frames present in the graph
        src = np.unique(act_ii)
        src_d = jnp.asarray(src, jnp.int32)
        self.damping = jaxutil.set_rows_at(self.damping, src_d, eta[src_d])

        self._bundle_adjustment(
            t0, t1, itrs,
            use_inactive=use_inactive,
            motion_only=motion_only,
            fixed_motion=fixed_motion,
            limited_disp=limited_disp,
            pose_damping=1e-3, pose_ep=0.1,
            optimize_intrinsics=self.optimize_intrinsics and not motion_only,
        )
        self.age[: self.n_edges] += 1

    def update_batch(
        self,
        itrs: int,
        steps: int,
        optimize_intrinsics: bool = False,
        solver_verbose: bool = False,
    ):
        """Backend-style batched update (reference :317-395): recompute corr
        per edge chunk (volume materialized per chunk, discarded after
        lookup), refresh all targets/weights, then one global BA per step."""
        if self.n_edges == 0:
            return
        t = self.buffer.n_frames
        Nb = bucket_size(t)

        # chunk edges by SOURCE FRAME ranges of 8 like the reference
        # (factor_graph.py:350-372) so each frame's damping comes from exactly
        # one chunk; additionally soft-cap chunks at BACKEND_CHUNK edges (the
        # corr volume transient is chunk_edges × h·w × h·w — unbounded chunks
        # OOM).  The cap splits ONLY at frame boundaries: a frame's damping
        # eta is a mean over that frame's edges in its chunk, so splitting one
        # frame across chunks would leave only the last chunk's partial mean.
        # A single frame whose edge count alone exceeds the cap becomes its
        # own (larger) chunk.
        act_ii = self.ii[: self.n_edges]
        act_jj = self.jj[: self.n_edges]
        frame_chunks = []
        for i0 in range(0, t, 8):
            cur: list = []
            for f in range(i0, min(i0 + 8, t)):
                sel_f = np.where(act_ii == f)[0]
                if not len(sel_f):
                    continue
                if cur and len(cur) + len(sel_f) > BACKEND_CHUNK:
                    frame_chunks.append(np.asarray(cur))
                    cur = []
                cur.extend(sel_f.tolist())
            if cur:
                frame_chunks.append(np.asarray(cur))

        # volumes depend only on the (static) keyframe features — build the
        # per-chunk pyramids ONCE and reuse across all steps (the reference's
        # AltCorrBlock recomputes the dot products per query instead)
        chunk_cache = {}
        for _ in range(steps):
            ii_d, jj_d, ev = self._active_arrays()
            coords1, valid1 = self.buffer.reproject(ii_d, jj_d)

            for ci, sel in enumerate(frame_chunks):
                Cb = bucket_size(len(sel), minimum=min(BACKEND_CHUNK, 16))
                sel_pad = np.zeros(Cb, np.int64)
                sel_pad[: len(sel)] = sel
                sl = jnp.asarray(sel_pad, jnp.int32)
                cv = jnp.asarray(np.arange(Cb) < len(sel))
                if ci not in chunk_cache:
                    chunk_cache[ci] = _jitted_edge_corr(
                        self.corr_levels, self.buffer.fmaps, ii_d[sl], jj_d[sl]
                    )
                pyr = chunk_cache[ci]
                corr_feat = corr_ops.corr_lookup_pyramid(
                    [p.astype(jnp.float32) for p in pyr], coords1[sl],
                    CORR_RADIUS,
                )
                net, target, weight, eta = self._run_update_fn(
                    self.f_net[sl], coords1[sl], self.target[sl],
                    ii_d[sl], jj_d[sl], ev[sl] & cv, corr_feat, Nb,
                )
                self.f_net = jaxutil.set_rows_at(self.f_net, sl, net)
                self.target = jaxutil.set_rows_at(self.target, sl, target)
                self.weight = jaxutil.set_rows_at(self.weight, sl, weight)
                src = np.unique(act_ii[sel])
                src_d = jnp.asarray(src, jnp.int32)
                self.damping = jaxutil.set_rows_at(self.damping, src_d, eta[src_d])

            self._bundle_adjustment(
                1, t, itrs,
                use_inactive=False, motion_only=False, fixed_motion=False,
                limited_disp=False,
                pose_damping=1e-5, pose_ep=1e-2,
                optimize_intrinsics=optimize_intrinsics,
            )

    def _bundle_adjustment(
        self,
        t0: int,
        t1: int,
        itrs: int,
        use_inactive: bool,
        motion_only: bool,
        fixed_motion: bool,
        limited_disp: bool,
        pose_damping: float,
        pose_ep: float,
        optimize_intrinsics: bool,
    ):
        """Pad active (+eligible inactive) edges and run the jitted BA solve
        (reference buffer.bundle_adjustment, buffer.py:373-525)."""
        buf = self.buffer
        weight_dense_disp = 0.001  # buffer.py:396

        act_ii = self.ii[: self.n_edges]
        act_jj = self.jj[: self.n_edges]
        if use_inactive:
            m = (self.ii_inac >= t0 - 3) & (self.jj_inac >= t0 - 3)
            all_ii = np.concatenate([self.ii_inac[m], act_ii])
            all_jj = np.concatenate([self.jj_inac[m], act_jj])
            sel_d = jnp.asarray(np.where(m)[0], jnp.int32)
            tgt_extra = self.target_inac[sel_d]
            wgt_extra = self.weight_inac[sel_d]
        else:
            all_ii, all_jj = act_ii, act_jj
            tgt_extra = None

        Etot = len(all_ii)
        Eb = bucket_size(max(Etot, 1), minimum=16)
        Nb = bucket_size(buf.n_frames)
        P = self.ht * self.wd

        ii_pad = np.zeros(Eb, np.int64)
        jj_pad = np.zeros(Eb, np.int64)
        ii_pad[:Etot] = all_ii
        jj_pad[:Etot] = all_jj
        ev = np.arange(Eb) < Etot

        if tgt_extra is not None:
            target = jnp.concatenate([tgt_extra, self.target[: self.max_factors]], 0)[:Eb]
            weight = jnp.concatenate([wgt_extra, self.weight[: self.max_factors]], 0)[:Eb]
        else:
            target = self.target[: self.max_factors]
            weight = self.weight[: self.max_factors]
        # pad or trim to Eb
        cur = target.shape[0]
        if cur < Eb:
            pad = ((0, Eb - cur), (0, 0), (0, 0), (0, 0))
            target = jnp.pad(target, pad)
            weight = jnp.pad(weight, pad)
        else:
            target = target[:Eb]
            weight = weight[:Eb]

        # per-frame slot grouping for the Schur assembly
        fill = np.bincount(all_ii, minlength=Nb).max() if Etot else 1
        M = bucket_size(int(fill), minimum=8)
        slot_edge = ba.build_edge_slots(ii_pad[:Etot], jj_pad[:Etot], Nb, M)
        # build_edge_slots marks empty slots with its edge count (Etot); the
        # jitted assembly tests slot validity against the PADDED count Eb —
        # remap so empty-slot detection never depends on padded-edge blocks
        # happening to be zero.
        slot_edge[slot_edge == Etot] = Eb

        cfg = ba.BAConfig(
            camera_type=buf.camera_type,
            ht=self.ht,
            wd=self.wd,
            optimize_intrinsics=optimize_intrinsics,
            alpha=buf.dense_disp_alpha,
            max_edges_per_frame=M,
            **self.ba_cfg_kwargs,
        )

        idx = np.arange(Nb)
        if fixed_motion:
            pose_mask = np.zeros(Nb, bool)
        else:
            pose_mask = (idx >= t0) & (idx < t1) & (idx < buf.n_frames)
        if motion_only:
            disp_mask = np.zeros(Nb, bool)
        elif limited_disp:
            disp_mask = (idx >= t0) & (idx < t1) & (idx < buf.n_frames)
        else:
            disp_mask = idx < buf.n_frames

        disp_damping = 0.2 * self.damping[:Nb].reshape(Nb, P) + 1e-7
        sens = buf.disps_sens[:Nb].reshape(Nb, P)
        sens_mask = (jnp.sum(sens, axis=1) > 0) & (not motion_only)

        poses, disps, intr = ba.ba_solve(
            cfg,
            buf.poses[:Nb],
            buf.disps[:Nb].reshape(Nb, P),
            buf.intrinsics,
            target.reshape(Eb, P, 2),
            weight.reshape(Eb, P, 2) * weight_dense_disp,
            jnp.asarray(ii_pad, jnp.int32),
            jnp.asarray(jj_pad, jnp.int32),
            jnp.asarray(ev),
            jnp.asarray(slot_edge),
            jnp.asarray(pose_mask),
            jnp.asarray(disp_mask),
            disp_damping,
            sens,
            sens_mask.astype(jnp.float32),
            jnp.int32(itrs),
            jnp.float32(pose_damping),
            jnp.float32(pose_ep),
        )
        buf.poses = jaxutil.set_prefix(buf.poses, poses)
        buf.disps = jaxutil.set_prefix(
            buf.disps, disps.reshape(Nb, self.ht, self.wd)
        )
        if optimize_intrinsics:
            buf.intrinsics = intr
