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
import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

# fine-grained phase attribution for the fused hot paths (the coarse
# VIPE_PROFILE marks in system.py can't see inside update_batch)
_PROF_FG = os.environ.get("VIPE_PROFILE_FG") == "1"
_prof_acc: dict = {}


def _pmark(name: str, t0: float, sync_val=None):
    if not _PROF_FG:
        return
    if sync_val is not None:
        # block_until_ready is a no-op over the axon tunnel — force a
        # scalar fetch to delimit device completion
        float(jnp.asarray(sync_val).reshape(-1)[0].astype(jnp.float32))
    _prof_acc[name] = _prof_acc.get(name, 0.0) + time.perf_counter() - t0
    _prof_acc[name + "_n"] = _prof_acc.get(name + "_n", 0.0) + 1


def _pdump(tag: str):
    if _PROF_FG and _prof_acc:
        print(tag, {k: round(v, 3) for k, v in _prof_acc.items()}, flush=True)
        _prof_acc.clear()

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
def _jitted_residual(camera_type, poses, rig, disps, intr,
                     pi, qi, di, pj, qj, ev, target, weight):
    """Σ w·(reproj − target)² over active edges, one dispatch.
    ``target``/``weight`` carry the scratch row (sliced off here)."""
    coords, valid = geom.reproject_mv(
        poses, rig, disps, intr, camera_type, pi, qi, di, pj, qj
    )
    r = coords - target
    w = weight * valid[..., None] * ev[:, None, None, None]
    return jnp.sum(w * r * r)


@functools.partial(jax.jit, static_argnums=0)
def _jitted_edge_corr(levels, fmaps, ii, jj):
    """Per-edge correlation pyramid (one compiled program per batch bucket)."""
    f1 = fmaps[ii].astype(jnp.float32)
    f2 = fmaps[jj].astype(jnp.float32)
    pyr = corr_ops.corr_pyramid(f1, f2, levels)
    return [p.astype(CORR_DTYPE) for p in pyr]


@functools.partial(jax.jit, static_argnums=0)
def _jitted_edge_corr_q(levels, fmaps, ii, jj):
    """Per-edge correlation pyramid, int8-quantized with per-edge scales
    (corr_dtype='int8'): builds in bf16 like ``_jitted_edge_corr`` then
    symmetric-quantizes each level (ops/corr.quantize_volume)."""
    f1 = fmaps[ii].astype(jnp.float32)
    f2 = fmaps[jj].astype(jnp.float32)
    pyr = corr_ops.corr_pyramid(f1, f2, levels)
    qs = [corr_ops.quantize_volume(p) for p in pyr]
    return [q for q, _ in qs], [s for _, s in qs]


@functools.partial(jax.jit, static_argnums=0)
def _jitted_edge_feat(levels, fmaps, ii, jj):
    """Per-edge packed correlation FEATURES (corr_mode='alt'): [f1,
    pooled f2 per level], /4-scaled bf16 — ~1/13 the volume memory, the
    windowed dots recomputed at lookup (fused Pallas kernel on TPU)."""
    return corr_ops.corr_feat_pack(
        fmaps[ii].astype(jnp.float32), fmaps[jj].astype(jnp.float32), levels
    )


@functools.lru_cache(maxsize=None)
def _jitted_gru_step(update_fn, camera_type):
    """Fused frontend GRU step: reproject + corr lookup + motion features +
    update network + weight masking, one compiled program per (E, Nb) shape.
    Eagerly this is ~300 small remote ops per call (~0.2 s over the TPU
    tunnel); fused it is one dispatch.

    Indices are EXPANDED (pi/qi/di/pj/qj over frame·view edges); ``rig`` and
    per-view ``intr_grid`` make the reprojection rig-aware (V=1: identity
    rig, one intrinsics row)."""

    @functools.partial(jax.jit, static_argnums=(1,))
    def step(params, num_seg, poses, rig, disps, intr_grid, corr_pyr, target,
             f_net, inps, masks, pi, qi, di, pj, qj, edge_valid):
        coords1, _ = geom.reproject_mv(
            poses, rig, disps, intr_grid, camera_type, pi, qi, di, pj, qj
        )
        # callers pass the FULL (EV+1)-row pyramids; slice in-program
        corr_feat = corr_ops.corr_lookup_pyramid(
            [p[: pi.shape[0]] for p in corr_pyr], coords1, CORR_RADIUS
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
        inp = inps[di].astype(jnp.float32)
        ix = jnp.where(edge_valid, di, num_seg).astype(jnp.int32)
        V = intr_grid.shape[0]
        dj = pj * V + qj  # target SLOT — real nets ignore jj, oracles use it
        net, delta, weight, eta = update_fn(
            params, f_net, inp, corr_feat, motn, ix, dj, num_seg + 1
        )
        bad = masks[di][..., None] | (~edge_valid)[:, None, None, None]
        weight = jnp.where(bad, 0.0, weight)
        new_target = coords1 + delta
        return net, new_target, weight, eta[:num_seg]

    return step


@functools.lru_cache(maxsize=None)
def _jitted_backend_chunk(update_fn, camera_type):
    """One backend chunk refresh as a single program: chunk-row reprojection
    + corr lookup from the cached pyramid + GRU — eagerly this is ~15 remote
    dispatches (gathers + einsums) per chunk per step."""

    @functools.partial(jax.jit, static_argnums=(1,))
    def step(params, num_seg, poses, rig, disps, intr_grid, pyr_chunk,
             f_net_full, target_full, inps, masks,
             sl, pi, qi, di, pj, qj, evcv):
        coords1, _ = geom.reproject_mv(
            poses, rig, disps, intr_grid, camera_type, pi, qi, di, pj, qj
        )
        corr_feat = corr_ops.corr_lookup_pyramid(
            pyr_chunk, coords1, CORR_RADIUS
        )
        ht, wd = disps.shape[-2:]
        u, v = jnp.meshgrid(
            jnp.arange(wd, dtype=jnp.float32),
            jnp.arange(ht, dtype=jnp.float32), indexing="xy",
        )
        grid = jnp.stack([u, v], axis=-1)
        target_prev = target_full[sl]
        motn = jnp.concatenate(
            [coords1 - grid, target_prev - coords1], axis=-1
        ).clip(-64.0, 64.0)
        inp = inps[di].astype(jnp.float32)
        ix = jnp.where(evcv, di, num_seg).astype(jnp.int32)
        V = intr_grid.shape[0]
        dj = pj * V + qj
        net, delta, weight, eta = update_fn(
            params, f_net_full[sl], inp, corr_feat, motn, ix, dj, num_seg + 1
        )
        bad = masks[di][..., None] | (~evcv)[:, None, None, None]
        weight = jnp.where(bad, 0.0, weight)
        return net, coords1 + delta, weight, eta[:num_seg]

    return step


@functools.lru_cache(maxsize=None)
def _jitted_backend_steps(update_fn, cfg, corr_alt: bool = False):
    """The ENTIRE backend ``update_batch`` as ONE compiled program:
    ``steps`` × (scan over edge chunks: on-the-fly corr pyramid → lookup →
    GRU → row scatter → per-frame damping; then a full multi-view BA solve).

    Replaces the per-step python loop (3 chunk programs + ~6 scatter
    programs + BA prep/solve per step ≈ 0.4 s/step of per-program tunnel
    overhead measured at ~5 ms of actual compute).  The chunk corr volumes
    are RECOMPUTED inside the loop from the feature maps — the transient is
    one chunk's pyramid (~Cb·P² bf16) instead of the cached-all-chunks
    pyramids of the old path, whose footprint grew linearly with edge count
    (reference AltCorrBlock recomputes for the same reason,
    /root/reference/vipe/slam/networks/droid_net.py:121-176)."""
    from ..ops import cameras as cam_ops

    camera_type = cfg.camera_type
    V = cfg.n_views

    @functools.partial(jax.jit, static_argnums=(1,))
    def run(params, NbV, poses, rig, disps, intr, fmaps, inps, masks,
            f_net, target, weight, damping,
            pi_all, qi_all, di_all, pj_all, qj_all, ev_all,
            sl_stk, cv_stk, src_stk,
            slot_edge, pose_mask, disp_mask, sens, sens_mask,
            steps, itrs, pose_damping, pose_ep):
        ht, wd = disps.shape[-2:]
        P = ht * wd
        EV = pi_all.shape[0]
        u, v = jnp.meshgrid(
            jnp.arange(wd, dtype=jnp.float32),
            jnp.arange(ht, dtype=jnp.float32), indexing="xy",
        )
        grid = jnp.stack([u, v], axis=-1)

        def chunk_body(c2, chunk):
            f_net, target, weight, damping, poses, rig_, disps, intr_grid = c2
            sl, cv, src = chunk
            pi = pi_all[sl]
            qi = qi_all[sl]
            di = di_all[sl]
            pj = pj_all[sl]
            qj = qj_all[sl]
            evc = ev_all[sl] & cv
            dj = (pj * V + qj).astype(jnp.int32)
            if corr_alt:
                # packed features: the chunk's ~Cb·P² volume transient never
                # exists — windows recomputed at lookup (Pallas on TPU)
                pyr = corr_ops.corr_feat_pack(
                    fmaps[di].astype(jnp.float32),
                    fmaps[dj].astype(jnp.float32), CORR_LEVELS,
                )
            else:
                pyr = [
                    p.astype(CORR_DTYPE)
                    for p in corr_ops.corr_pyramid(
                        fmaps[di].astype(jnp.float32),
                        fmaps[dj].astype(jnp.float32), CORR_LEVELS,
                    )
                ]
            coords1, _ = geom.reproject_mv(
                poses, rig_, disps, intr_grid, camera_type, pi, qi, di, pj, qj
            )
            corr_feat = corr_ops.corr_lookup_pyramid(pyr, coords1, CORR_RADIUS)
            motn = jnp.concatenate(
                [coords1 - grid, target[sl] - coords1], axis=-1
            ).clip(-64.0, 64.0)
            inp = inps[di].astype(jnp.float32)
            ix = jnp.where(evc, di, NbV).astype(jnp.int32)
            net, delta, w8, eta = update_fn(
                params, f_net[sl], inp, corr_feat, motn, ix, dj, NbV + 1
            )
            bad = masks[di][..., None] | (~evc)[:, None, None, None]
            w8 = jnp.where(bad, 0.0, w8)
            f_net = f_net.at[sl].set(net)
            target = target.at[sl].set(coords1 + delta)
            weight = weight.at[sl].set(w8)
            # src is padded with NbV → writes land on damping's scratch row
            damping = damping.at[src].set(eta[src])
            return (f_net, target, weight, damping, poses, rig_, disps,
                    intr_grid), None

        def step_body(_, carry):
            poses, rig_, disps, intr, f_net, target, weight, damping = carry
            intr_grid = cam_ops.scaled_intrinsics(camera_type, intr, 1.0 / 8.0)
            (f_net, target, weight, damping, *_rest), _ = jax.lax.scan(
                chunk_body,
                (f_net, target, weight, damping, poses, rig_, disps,
                 intr_grid),
                (sl_stk, cv_stk, src_stk),
            )
            tgt = target[:-1].reshape(EV, P, 2)
            wgt = weight[:-1].reshape(EV, P, 2) * 0.001  # buffer.py:396
            disp_damping = 0.2 * damping[:NbV].reshape(NbV, P) + 1e-7
            poses, rig_, disps_flat, intr = ba.ba_solve_mv(
                cfg, poses, rig_, disps.reshape(NbV, P), intr, tgt, wgt,
                pi_all, qi_all, di_all, pj_all, qj_all, ev_all,
                slot_edge, pose_mask, disp_mask, disp_damping, sens,
                sens_mask, itrs, pose_damping, pose_ep,
            )
            return (poses, rig_, disps_flat.reshape(NbV, ht, wd), intr,
                    f_net, target, weight, damping)

        return jax.lax.fori_loop(
            0, steps, step_body,
            (poses, rig, disps, intr, f_net, target, weight, damping),
        )

    return run


def _make_round_runner(update_fn, cfg, params, Nb, corr_pyr, inps, masks,
                       ii_act, jj_act, ev_act, tgt_inac, wgt_inac,
                       ii_ba, jj_ba, ev_ba, slot_edge, src_rows,
                       pose_mask, disp_mask, sens, itrs,
                       pose_damping, pose_ep):
    """Traceable closure running N chained (GRU -> dense BA) rounds over the
    state tuple (poses, disps, intrinsics, f_net, target, weight, damping).
    Shared by the fused-rounds and fused-frontend-step programs."""
    from ..ops import cameras as cam_ops

    camera_type = cfg.camera_type
    ht = cfg.ht
    wd = cfg.wd
    P = ht * wd
    u, v = jnp.meshgrid(
        jnp.arange(wd, dtype=jnp.float32),
        jnp.arange(ht, dtype=jnp.float32), indexing="xy",
    )
    grid = jnp.stack([u, v], axis=-1)
    weight_dense_disp = 0.001  # buffer.py:396
    sens_mask = (jnp.sum(sens, axis=1) > 0).astype(jnp.float32)

    def run_rounds(state, n_rounds: int):
        # lax.fori_loop, not python unroll: the frontend/filler programs run
        # up to 10 rounds — unrolled, their HLO took minutes per shape bucket
        # to compile over the remote tunnel
        def one_round(_, st):
            return _round_body(st)

        return jax.lax.fori_loop(0, n_rounds, one_round, state)

    def _round_body(state):
        poses, disps, intrinsics, f_net, target, weight, damping = state
        for _ in range(1):
            intr_grid = cam_ops.scaled_intrinsics(
                camera_type, intrinsics, 1.0 / 8.0
            )
            coords1, _ = geom.reproject(
                poses, disps, intr_grid, camera_type, ii_act, jj_act
            )
            corr_feat = corr_ops.corr_lookup_pyramid(
                corr_pyr, coords1, CORR_RADIUS
            )
            motn = jnp.concatenate(
                [coords1 - grid, target - coords1], axis=-1
            ).clip(-64.0, 64.0)
            inp = inps[ii_act].astype(jnp.float32)
            ix = jnp.where(ev_act, ii_act, Nb).astype(jnp.int32)
            f_net, delta, weight, eta = update_fn(
                params, f_net, inp, corr_feat, motn, ix, jj_act, Nb + 1
            )
            bad = masks[ii_act][..., None] | (~ev_act)[:, None, None, None]
            weight = jnp.where(bad, 0.0, weight)
            target = coords1 + delta

            eta_pad = jnp.concatenate([eta[:Nb], jnp.zeros((1, ht, wd))], 0)
            damping = damping.at[src_rows].set(eta_pad[src_rows])

            tgt_all = jnp.concatenate([tgt_inac, target], 0)
            wgt_all = jnp.concatenate([wgt_inac, weight], 0)
            disp_damping = 0.2 * damping[:Nb].reshape(Nb, P) + 1e-7
            poses, disps_flat, intrinsics = ba.ba_solve(
                cfg, poses, disps.reshape(Nb, P), intrinsics,
                tgt_all.reshape(-1, P, 2),
                wgt_all.reshape(-1, P, 2) * weight_dense_disp,
                ii_ba, jj_ba, ev_ba, slot_edge,
                pose_mask, disp_mask, disp_damping, sens, sens_mask,
                itrs, pose_damping, pose_ep,
            )
            disps = disps_flat.reshape(Nb, ht, wd)
        return (poses, disps, intrinsics, f_net, target, weight, damping)

    return run_rounds


def _make_round_runner_mv(update_fn, cfg, params, Nb, corr_pyr, inps, masks,
                          pi_act, qi_act, di_act, pj_act, qj_act, ev_act,
                          tgt_inac, wgt_inac, pi_ba, qi_ba, di_ba, pj_ba,
                          qj_ba, ev_ba, slot_edge, src_rows,
                          pose_mask, disp_mask, sens, itrs,
                          pose_damping, pose_ep):
    """Rig-aware analog of ``_make_round_runner`` over EXPANDED (frame,
    view) edges (reference expand_edge_multiview, buffer.py:303-361): rig
    compose in the reprojection chain, per-view intrinsics, slot-major
    disps/damping, ``ba_solve_mv`` with the rig group.  State carries
    (poses, rig, disps, intr, f_net, target, weight, damping).  The V = 1
    runner stays byte-identical (proven programs, warm caches); this one
    gives rigs the same one-dispatch keyframe step."""
    from ..ops import cameras as cam_ops

    camera_type = cfg.camera_type
    V = cfg.n_views
    NbV = Nb * V
    ht = cfg.ht
    wd = cfg.wd
    P = ht * wd
    u, v = jnp.meshgrid(
        jnp.arange(wd, dtype=jnp.float32),
        jnp.arange(ht, dtype=jnp.float32), indexing="xy",
    )
    grid = jnp.stack([u, v], axis=-1)
    weight_dense_disp = 0.001  # buffer.py:396
    sens_mask = (jnp.sum(sens, axis=1) > 0).astype(jnp.float32)
    dj_act = (pj_act * V + qj_act).astype(jnp.int32)

    def run_rounds(state, n_rounds: int):
        def one_round(_, st):
            return _round_body(st)

        return jax.lax.fori_loop(0, n_rounds, one_round, state)

    def _round_body(state):
        poses, rig_, disps, intrinsics, f_net, target, weight, damping = state
        intr_grid = cam_ops.scaled_intrinsics(
            camera_type, intrinsics, 1.0 / 8.0
        )
        coords1, _ = geom.reproject_mv(
            poses, rig_, disps, intr_grid, camera_type,
            pi_act, qi_act, di_act, pj_act, qj_act,
        )
        corr_feat = corr_ops.corr_lookup_pyramid(
            corr_pyr, coords1, CORR_RADIUS
        )
        motn = jnp.concatenate(
            [coords1 - grid, target - coords1], axis=-1
        ).clip(-64.0, 64.0)
        inp = inps[di_act].astype(jnp.float32)
        ix = jnp.where(ev_act, di_act, NbV).astype(jnp.int32)
        f_net, delta, weight, eta = update_fn(
            params, f_net, inp, corr_feat, motn, ix, dj_act, NbV + 1
        )
        bad = masks[di_act][..., None] | (~ev_act)[:, None, None, None]
        weight = jnp.where(bad, 0.0, weight)
        target = coords1 + delta

        eta_pad = jnp.concatenate([eta[:NbV], jnp.zeros((1, ht, wd))], 0)
        damping = damping.at[src_rows].set(eta_pad[src_rows])

        tgt_all = jnp.concatenate([tgt_inac, target], 0)
        wgt_all = jnp.concatenate([wgt_inac, weight], 0)
        disp_damping = 0.2 * damping[:NbV].reshape(NbV, P) + 1e-7
        poses, rig_, disps_flat, intrinsics = ba.ba_solve_mv(
            cfg, poses, rig_, disps.reshape(NbV, P), intrinsics,
            tgt_all.reshape(-1, P, 2),
            wgt_all.reshape(-1, P, 2) * weight_dense_disp,
            pi_ba, qi_ba, di_ba, pj_ba, qj_ba, ev_ba, slot_edge,
            pose_mask, disp_mask, disp_damping, sens, sens_mask,
            itrs, pose_damping, pose_ep,
        )
        disps = disps_flat.reshape(NbV, ht, wd)
        return (poses, rig_, disps, intrinsics, f_net, target, weight,
                damping)

    return run_rounds


@functools.lru_cache(maxsize=None)
def _jitted_fused_rounds_mv(update_fn, cfg, rounds: int):
    """Rig-aware ``_jitted_fused_rounds``: K chained (GRU → mv BA) rounds in
    one program over expanded (frame, view) edges."""

    @functools.partial(jax.jit, static_argnums=(1,))
    def run(params, Nb, poses, rig, disps, intrinsics, corr_pyr, target,
            f_net, inps, masks, pi_act, qi_act, di_act, pj_act, qj_act,
            ev_act, damping, t_inac_full, w_inac_full, sel_inac,
            pi_ba, qi_ba, di_ba, pj_ba, qj_ba, ev_ba, slot_edge,
            src_rows, pose_mask, disp_mask, sens,
            itrs, pose_damping, pose_ep):
        tgt_inac = t_inac_full[sel_inac]
        wgt_inac = w_inac_full[sel_inac]
        corr_pyr = [p[: pi_act.shape[0]] for p in corr_pyr]
        ht, wd = disps.shape[-2:]
        damping = jnp.concatenate([damping, jnp.zeros((1, ht, wd))], 0)

        run_rounds = _make_round_runner_mv(
            update_fn, cfg, params, Nb, corr_pyr, inps, masks,
            pi_act, qi_act, di_act, pj_act, qj_act, ev_act,
            tgt_inac, wgt_inac, pi_ba, qi_ba, di_ba, pj_ba, qj_ba, ev_ba,
            slot_edge, src_rows, pose_mask, disp_mask, sens,
            itrs, pose_damping, pose_ep,
        )
        NbV = Nb * cfg.n_views
        state = (poses, rig, disps, intrinsics, f_net, target,
                 jnp.zeros_like(target), damping)
        (poses, rig, disps, intrinsics, f_net, target, weight, damping) = (
            run_rounds(state, rounds)
        )
        return (poses, rig, disps, intrinsics, f_net, target, weight,
                damping[:NbV])

    return run


@functools.lru_cache(maxsize=None)
def _jitted_frontend_step_mv(update_fn, cfg, r1: int, r2: int,
                             const_vel: bool):
    """Rig-aware ``_jitted_frontend_step``: the whole per-keyframe frontend
    optimization for a V-view rig as ONE dispatch — r1 rounds → per-view
    bidirectional removal distance (max over views, the reference's rig
    semantics in buffer.frame_distance) → lax.cond r2 rounds + next-slot
    init (const-velocity frame pose + mean disp broadcast over the V
    slots)."""

    @functools.partial(jax.jit, static_argnums=(1,))
    def run(params, Nb, poses, rig, disps, intrinsics, corr_pyr, target,
            f_net, inps, masks, pi_act, qi_act, di_act, pj_act, qj_act,
            ev_act, damping, t_inac_full, w_inac_full, sel_inac,
            pi_ba, qi_ba, di_ba, pj_ba, qj_ba, ev_ba, slot_edge,
            src_rows, pose_mask, disp_mask, sens,
            itrs, pose_damping, pose_ep,
            d_i, d_j, kf_thresh, beta, t1):
        from ..ops import cameras as cam_ops
        from ..ops import lie as lie_ops

        V = cfg.n_views
        NbV = Nb * V
        tgt_inac = t_inac_full[sel_inac]
        wgt_inac = w_inac_full[sel_inac]
        corr_pyr = [p[: pi_act.shape[0]] for p in corr_pyr]
        ht, wd = disps.shape[-2:]
        damping = jnp.concatenate([damping, jnp.zeros((1, ht, wd))], 0)

        run_rounds = _make_round_runner_mv(
            update_fn, cfg, params, Nb, corr_pyr, inps, masks,
            pi_act, qi_act, di_act, pj_act, qj_act, ev_act,
            tgt_inac, wgt_inac, pi_ba, qi_ba, di_ba, pj_ba, qj_ba, ev_ba,
            slot_edge, src_rows, pose_mask, disp_mask, sens,
            itrs, pose_damping, pose_ep,
        )
        state = (poses, rig, disps, intrinsics, f_net, target,
                 jnp.zeros_like(target), damping)
        state = run_rounds(state, r1)

        # per-view bidirectional removal distance, max over views
        # (reference buffer.frame_distance rig path)
        pin = cam_ops.pinhole_equivalent(cfg.camera_type, state[3]) / 8.0
        qv = jnp.arange(V, dtype=jnp.int32)
        pi_d = jnp.broadcast_to(d_i, (V,)).astype(jnp.int32)
        pj_d = jnp.broadcast_to(d_j, (V,)).astype(jnp.int32)
        dd = geom.frame_distance_mv(
            state[0], state[1], state[2], pin, pi_d, qv, pi_d * V + qv,
            pj_d, qv, beta=beta,
        )
        dd2 = geom.frame_distance_mv(
            state[0], state[1], state[2], pin, pj_d, qv, pj_d * V + qv,
            pi_d, qv, beta=beta,
        )
        d = jnp.max(0.5 * (dd + dd2))

        def keep_branch(st):
            st = run_rounds(st, r2)
            poses_, disps_ = st[0], st[2]
            if const_vel:
                p1 = poses_[t1 - 2]
                p2 = poses_[t1 - 1]
                w = lie_ops.se3_log(
                    lie_ops.se3_mul(p2, lie_ops.se3_inv(p1))
                ) * 0.5
                poses_ = poses_.at[t1].set(
                    lie_ops.se3_mul(lie_ops.se3_exp(w), p2)
                )
            # next-slot disparity init mirrors _jitted_mean_disp_init V > 1:
            # mean over the previous frame's V slots, broadcast to all V
            prev = jax.lax.dynamic_slice_in_dim(disps_, (t1 - 1) * V, V)
            fill = jnp.broadcast_to(jnp.mean(prev), prev.shape)
            disps_ = jax.lax.dynamic_update_slice_in_dim(
                disps_, fill, t1 * V, 0
            )
            return (poses_, st[1], disps_) + st[3:]

        state = jax.lax.cond(d >= kf_thresh, keep_branch, lambda st: st, state)
        (poses, rig, disps, intrinsics, f_net, target, weight, damping) = (
            state
        )
        return (poses, rig, disps, intrinsics, f_net, target, weight,
                damping[:NbV], d)

    return run


@functools.lru_cache(maxsize=None)
def _jitted_fused_rounds(update_fn, cfg, rounds: int):
    """K chained (GRU -> dense BA) rounds in ONE compiled program.

    The frontend runs iters1=4 then iters2=2 such rounds per keyframe
    (reference frontend.py:97-117); issuing them as separate programs costs
    a dispatch + dependency stall per round over the remote-TPU tunnel.

    Edge layout: BA consumes [inactive (K rows) ++ active (E rows)]; the
    inactive block is bucket-padded by the caller so compile keys repeat.
    """

    @functools.partial(jax.jit, static_argnums=(1,))
    def run(params, Nb, poses, disps, intrinsics, corr_pyr, target, f_net,
            inps, masks, ii_act, jj_act, ev_act, damping,
            t_inac_full, w_inac_full, sel_inac, ii_ba, jj_ba, ev_ba, slot_edge,
            src_rows, pose_mask, disp_mask, sens,
            itrs, pose_damping, pose_ep):
        # inactive rows gathered in-program (rows beyond the valid count are
        # zero-weighted through ev_ba)
        tgt_inac = t_inac_full[sel_inac]
        wgt_inac = w_inac_full[sel_inac]
        # active-row slice of the full (EV+1)-row pyramids in-program (an
        # eager slice would copy the whole volume set per dispatch)
        corr_pyr = [p[: ii_act.shape[0]] for p in corr_pyr]
        ht, wd = disps.shape[-2:]
        # eta scatter: padding entries of src_rows point at the scratch row Nb
        damping = jnp.concatenate([damping, jnp.zeros((1, ht, wd))], 0)

        run_rounds = _make_round_runner(
            update_fn, cfg, params, Nb, corr_pyr, inps, masks,
            ii_act, jj_act, ev_act, tgt_inac, wgt_inac,
            ii_ba, jj_ba, ev_ba, slot_edge, src_rows,
            pose_mask, disp_mask, sens, itrs, pose_damping, pose_ep,
        )
        state = (poses, disps, intrinsics, f_net, target,
                 jnp.zeros_like(target), damping)
        (poses, disps, intrinsics, f_net, target, weight, damping) = (
            run_rounds(state, rounds)
        )
        return poses, disps, intrinsics, f_net, target, weight, damping[:Nb]

    return run


@functools.lru_cache(maxsize=None)
def _jitted_frontend_step(update_fn, cfg, r1: int, r2: int, const_vel: bool):
    """The ENTIRE per-keyframe frontend optimization as one dispatch:
    iters1 rounds -> keyframe-removal distance -> (lax.cond) iters2 rounds +
    next-slot constant-velocity/disp initialization (reference
    frontend.py:97-124).  The only host sync left per keyframe is the
    returned distance scalar."""

    @functools.partial(jax.jit, static_argnums=(1,))
    def run(params, Nb, poses, disps, intrinsics, corr_pyr, target, f_net,
            inps, masks, ii_act, jj_act, ev_act, damping,
            t_inac_full, w_inac_full, sel_inac, ii_ba, jj_ba, ev_ba, slot_edge,
            src_rows, pose_mask, disp_mask, sens,
            itrs, pose_damping, pose_ep,
            d_i, d_j, kf_thresh, beta, t1):
        from ..ops import cameras as cam_ops
        from ..ops import lie as lie_ops

        tgt_inac = t_inac_full[sel_inac]
        wgt_inac = w_inac_full[sel_inac]
        corr_pyr = [p[: ii_act.shape[0]] for p in corr_pyr]
        ht, wd = disps.shape[-2:]
        damping = jnp.concatenate([damping, jnp.zeros((1, ht, wd))], 0)

        run_rounds = _make_round_runner(
            update_fn, cfg, params, Nb, corr_pyr, inps, masks,
            ii_act, jj_act, ev_act, tgt_inac, wgt_inac,
            ii_ba, jj_ba, ev_ba, slot_edge, src_rows,
            pose_mask, disp_mask, sens, itrs, pose_damping, pose_ep,
        )
        state = (poses, disps, intrinsics, f_net, target,
                 jnp.zeros_like(target), damping)
        state = run_rounds(state, r1)

        # keyframe-removal distance on the in-flight state
        pin = cam_ops.pinhole_equivalent(
            cfg.camera_type, state[2]
        ) / 8.0
        pin2 = jnp.broadcast_to(pin, (Nb, 4))
        dd = geom.frame_distance(
            state[0], state[1], pin2, d_i, d_j, di=d_i, beta=beta
        )
        dd2 = geom.frame_distance(
            state[0], state[1], pin2, d_j, d_i, di=d_j, beta=beta
        )
        d = jnp.max(0.5 * (dd + dd2))

        def keep_branch(st):
            st = run_rounds(st, r2)
            poses_, disps_ = st[0], st[1]
            if const_vel:
                p1 = poses_[t1 - 2]
                p2 = poses_[t1 - 1]
                w = lie_ops.se3_log(
                    lie_ops.se3_mul(p2, lie_ops.se3_inv(p1))
                ) * 0.5
                poses_ = poses_.at[t1].set(
                    lie_ops.se3_mul(lie_ops.se3_exp(w), p2)
                )
            disps_ = disps_.at[t1].set(jnp.mean(disps_[t1 - 1]))
            return (poses_, disps_) + st[2:]

        state = jax.lax.cond(d >= kf_thresh, keep_branch, lambda st: st, state)
        (poses, disps, intrinsics, f_net, target, weight, damping) = state
        return (poses, disps, intrinsics, f_net, target, weight,
                damping[:Nb], d)

    return run


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
def _jitted_rm_store(target, weight, t_inac, w_inac, perm, drop, dst):
    """Fused inactive-store + permute: gather the dropped rows into the
    capacity-managed inactive buffers and compact the active rows — one
    dispatch, everything donated (an eager gather interleaved with the
    donated permutes measures 3× slower over the remote tunnel)."""
    t_inac = t_inac.at[dst].set(target[drop])
    w_inac = w_inac.at[dst].set(weight[drop])
    return target[perm], weight[perm], t_inac, w_inac


@functools.partial(jax.jit, donate_argnums=(0,))
def _jitted_take_rows(arr, rows):
    return arr[rows]


@functools.partial(jax.jit, static_argnums=(0,))
def _jitted_pack_ba_edges(Kb, t_inac, w_inac, sel, target, weight, wdd):
    """[inactive-selection ++ full active store] as (Eb, P, 2) BA inputs —
    one dispatch; the weight pre-scale (buffer.py:396) is fused in."""
    t = jnp.concatenate([t_inac[sel], target[:-1]], 0)
    w = jnp.concatenate([w_inac[sel], weight[:-1]], 0) * wdd
    Eb, H, W, _ = t.shape
    return t.reshape(Eb, H * W, 2), w.reshape(Eb, H * W, 2)


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


@functools.partial(jax.jit, static_argnums=(0,))
def _jitted_distance_matrix_pred(n, poses, disps, intrinsics, beta, s):
    """Distance matrix with row ``s`` OVERLAID by the keep-branch scratch-slot
    init (constant-velocity pose from rows s-1/s-2 + mean disp of row s-1)
    computed IN-PROGRAM.  Used by the frontend's PRE-STEP speculative
    submission: the matrix is enqueued before the fused frontend step, so by
    the next keyframe its transfer has completed and the proximity readback
    never blocks.  Row ``s`` is exactly what the fused step's keep branch
    would write — just from the pre-BA state (one-step-stale distances; the
    keyframe-removal decision itself stays exact, it is computed in-program
    from post-BA state)."""
    from ..ops import lie as lie_ops

    p1 = poses[s - 2]
    p2 = poses[s - 1]
    w = lie_ops.se3_log(lie_ops.se3_mul(p2, lie_ops.se3_inv(p1))) * 0.5
    poses = poses.at[s].set(lie_ops.se3_mul(lie_ops.se3_exp(w), p2))
    disps = disps.at[s].set(jnp.mean(disps[s - 1]))
    ii, jj = jnp.meshgrid(jnp.arange(n), jnp.arange(n), indexing="ij")
    d = geom.frame_distance(
        poses, disps, intrinsics, ii.reshape(-1), jj.reshape(-1),
        di=ii.reshape(-1), beta=beta,
    ).reshape(n, n)
    return 0.5 * (d + d.T)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _jitted_distance_matrix_mv(n, V, poses, rig, disps, intr, beta):
    """Multi-view n×n distance matrix: per-view same-view distances averaged
    over views (reference factor_graph.py:440-441 `d.mean(-1)`), then
    symmetrized like the V=1 matrix."""
    ii, jj = jnp.meshgrid(jnp.arange(n), jnp.arange(n), indexing="ij")
    ii = ii.reshape(-1)
    jj = jj.reshape(-1)
    acc = jnp.zeros((n * n,), jnp.float32)
    for v in range(V):
        qv = jnp.full_like(ii, v)
        acc = acc + geom.frame_distance_mv(
            poses, rig, disps, intr, ii, qv, ii * V + qv, jj, qv, beta=beta
        )
    d = (acc / V).reshape(n, n)
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
        corr_mode: str = "volume",
        corr_dtype: str = "bf16",
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
        self.optimize_rig = bool(
            getattr(buffer, "n_views", 1) > 1
            and self.ba_cfg_kwargs.pop("optimize_rig", False)
        )

        # multiview: every frame edge expands into V per-view edges
        # (reference expand_edge_multiview, buffer.py:303-361); device edge
        # arrays are sized for the EXPANDED count
        self.V = getattr(buffer, "n_views", 1)
        E = max_factors
        EV = E * self.V
        self.EV = EV
        ht, wd = buffer.ht, buffer.wd
        self.ht, self.wd = ht, wd
        self.corr_levels = CORR_LEVELS
        self.n_edges = 0
        self.ii = np.zeros(E, np.int64)
        self.jj = np.zeros(E, np.int64)
        self.age = np.zeros(E, np.int64)
        # expanded indices of the active edges (host; row-aligned with the
        # device arrays below, V rows per frame edge)
        self.exp = np.zeros((EV, 5), np.int64)  # pi, qi, di, pj, qj

        # EV+1 rows: row EV is a scratch slot — add_factors pads its batches
        # to power-of-two buckets (constant shapes → no recompile per batch
        # size) and routes the padding writes there
        self.target = jnp.zeros((EV + 1, ht, wd, 2), jnp.float32)
        self.weight = jnp.zeros((EV + 1, ht, wd, 2), jnp.float32)
        self.f_net = jnp.zeros((EV + 1, ht, wd, 128), jnp.float32)

        # 'volume': materialized per-edge correlation pyramids (reference
        # CorrBlock).  'alt': packed per-edge features [f1, pooled f2 per
        # level] — the windowed dots are recomputed at every lookup (the
        # reference's altcorr formulation; the fused Pallas kernel builds
        # each volume block in VMEM).  Same row machinery either way.
        self.corr_mode = corr_mode
        # int8 quantized stored volumes (volume mode only): ~½ the edge-state
        # HBM of bf16 with per-edge dequant scales — the lever that fits ≥4
        # interleaved videos on one chip (see ops/corr.QVol)
        self.corr_q = corr_dtype == "int8" and corr_mode != "alt"
        self.corr_scale = None
        if incremental:
            if corr_mode == "alt":
                C = buffer.fmaps.shape[-1]
                dims = [(ht, wd)] + [
                    corr_ops.level_dims(ht, wd, l)
                    for l in range(self.corr_levels)
                ]
                self.corr_pyr = [
                    jnp.zeros((EV + 1,) + d + (C,), CORR_DTYPE) for d in dims
                ]
            else:
                vdt = jnp.int8 if self.corr_q else CORR_DTYPE
                self.corr_pyr = [
                    jnp.zeros(
                        (EV + 1, ht, wd) + corr_ops.level_dims(ht, wd, l),
                        vdt,
                    )
                    for l in range(self.corr_levels)
                ]
                if self.corr_q:
                    self.corr_scale = [
                        jnp.zeros((EV + 1,), jnp.float32)
                        for _ in range(self.corr_levels)
                    ]
        else:
            self.corr_pyr = None

        # per-disp-variable GRU-predicted BA damping (factor_graph.py:76)
        self.damping = jnp.full(
            (buffer.buffer_size * self.V, ht, wd), 1e-6, jnp.float32
        )

        # inactive (stored) factors (reference :89-94): indices on the host,
        # target/weight stay ON DEVICE — round-tripping them per BA call
        # costs ~1 s/keyframe once a few hundred edges accumulate.
        # Device arrays are CAPACITY-managed (+1 scratch row for padded
        # scatters): only rows < len(ii_inac)·V are valid.  Growing by
        # concatenation instead would interleave an eager gather with the
        # donated permutes in rm_factors — measured 3× slower over the
        # remote tunnel.
        self.ii_inac = np.zeros((0,), np.int64)
        self.jj_inac = np.zeros((0,), np.int64)
        self.exp_inac = np.zeros((0, 5), np.int64)
        self._inac_cap = 16
        self.target_inac = jnp.zeros(
            (self._inac_cap + 1, ht, wd, 2), jnp.float32
        )
        self.weight_inac = jnp.zeros(
            (self._inac_cap + 1, ht, wd, 2), jnp.float32
        )

    def _grow_inac(self, need_rows: int):
        """Ensure the device inactive stores hold ``need_rows`` valid rows
        (+1 scratch).  Rare (capacity doubles), so the eager pad is fine."""
        if need_rows <= self._inac_cap:
            return
        from .buffer import bucket_size

        new_cap = bucket_size(need_rows, minimum=16)
        pad = new_cap - self._inac_cap
        ht, wd = self.ht, self.wd
        zeros = jnp.zeros((pad, ht, wd, 2), jnp.float32)
        self.target_inac = jnp.concatenate([self.target_inac, zeros], 0)
        self.weight_inac = jnp.concatenate([self.weight_inac, zeros], 0)
        self._inac_cap = new_cap

    # ------------------------------------------------------------ edge admin

    def _pyr_list(self):
        """Stored pyramids as jit-ready args: plain arrays, or ``QVol``
        (int8 volume + per-edge scale) pytrees in quantized mode."""
        if self.corr_scale is not None:
            return [
                corr_ops.QVol(q, s)
                for q, s in zip(self.corr_pyr, self.corr_scale)
            ]
        return list(self.corr_pyr)

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
        V = self.V
        self.ii[start: start + k] = ii
        self.jj[start: start + k] = jj
        self.age[start: start + k] = 0
        pi, qi, di, pj, qj, dj = self.buffer.expand_edge_multiview(ii, jj)
        self.exp[start * V: (start + k) * V] = np.stack(
            [pi, qi, di, pj, qj], axis=-1
        )

        # pad each batch to a power-of-two bucket (≤ ADD_CHUNK) so compute +
        # scatter shapes repeat across calls; padding rows land in the scratch
        # slot EV.  Chunking bounds the transient HBM of the volume build.
        ev_chunk = ADD_CHUNK * V
        for c0 in range(0, k * V, ev_chunk):
            sl = slice(c0, min(c0 + ev_chunk, k * V))
            kc = sl.stop - sl.start
            kb = bucket_size(kc, minimum=4)

            def pad(a):
                return np.concatenate([a[sl], np.full(kb - kc, a[sl][-1])])

            di_pad = pad(di)
            dj_pad = pad(dj)
            rows = np.full(kb, self.EV, np.int32)
            rows[:kc] = np.arange(start * V + c0, start * V + sl.stop)

            rows_d = jnp.asarray(rows, jnp.int32)
            di_d = jnp.asarray(di_pad, jnp.int32)
            dj_d = jnp.asarray(dj_pad, jnp.int32)
            coords, _ = self._reproject_exp(
                pad(pi), pad(qi), di_pad, pad(pj), pad(qj)
            )
            self.target = jaxutil.set_rows_at(self.target, rows_d, coords)
            self.weight = jaxutil.set_rows_at(
                self.weight, rows_d, jnp.zeros_like(coords)
            )
            self.f_net = jaxutil.set_rows_at(
                self.f_net, rows_d, self.buffer.nets[di_d].astype(jnp.float32)
            )
            if self.incremental:
                if self.corr_q:
                    pyr, sca = _jitted_edge_corr_q(
                        self.corr_levels, self.buffer.fmaps, di_d, dj_d
                    )
                    for l in range(len(self.corr_pyr)):
                        self.corr_scale[l] = jaxutil.set_rows_at(
                            self.corr_scale[l], rows_d, sca[l]
                        )
                else:
                    build = (_jitted_edge_feat if self.corr_mode == "alt"
                             else _jitted_edge_corr)
                    pyr = build(
                        self.corr_levels, self.buffer.fmaps, di_d, dj_d
                    )
                for l in range(len(self.corr_pyr)):
                    self.corr_pyr[l] = jaxutil.set_rows_at(
                        self.corr_pyr[l], rows_d, pyr[l]
                    )
        self.n_edges += k

    def _reproject_exp(self, pi, qi, di, pj, qj):
        """Expanded-edge reprojection (rig-aware for V > 1)."""
        buf = self.buffer
        if self.V == 1:
            return buf.reproject(jnp.asarray(di, jnp.int32),
                                 jnp.asarray(np.asarray(pj), jnp.int32))
        intr = buf.scaled_intrinsics
        return geom.reproject_mv(
            buf.poses, buf.rig, buf.disps, intr, buf.camera_type,
            jnp.asarray(pi, jnp.int32), jnp.asarray(qi, jnp.int32),
            jnp.asarray(di, jnp.int32), jnp.asarray(pj, jnp.int32),
            jnp.asarray(qj, jnp.int32),
        )

    def rm_factors(self, mask, store: bool = False):
        """Drop edges, optionally storing them as inactive (reference :176-204)."""
        V = self.V
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
        drop_exp = (drop[:, None] * V + np.arange(V)).reshape(-1)

        perm_f = np.concatenate([keep, drop])
        perm = np.concatenate([
            (perm_f[:, None] * V + np.arange(V)).reshape(-1),
            np.arange(self.n_edges * V, self.EV + 1),
        ])
        perm_d = jnp.asarray(perm, jnp.int32)

        if store:
            n0 = len(self.ii_inac) * V
            self.ii_inac = np.concatenate([self.ii_inac, self.ii[drop]])
            self.jj_inac = np.concatenate([self.jj_inac, self.jj[drop]])
            self.exp_inac = np.concatenate(
                [self.exp_inac, self.exp[drop_exp]], axis=0
            )
            k = len(drop_exp)
            self._grow_inac(n0 + k)
            # pad the scatter to a pow2 bucket (scratch row self._inac_cap)
            # so the fused store+permute compiles once per bucket
            from .buffer import bucket_size

            kb = bucket_size(k, minimum=4)
            drop_pad = np.full(kb, drop_exp[-1], np.int64)
            drop_pad[:k] = drop_exp
            dst_pad = np.full(kb, self._inac_cap, np.int64)
            dst_pad[:k] = np.arange(n0, n0 + k)
            (self.target, self.weight, self.target_inac,
             self.weight_inac) = _jitted_rm_store(
                self.target, self.weight, self.target_inac, self.weight_inac,
                perm_d, jnp.asarray(drop_pad, jnp.int32),
                jnp.asarray(dst_pad, jnp.int32),
            )
        else:
            self.target = jaxutil.permute_rows(self.target, perm_d)
            self.weight = jaxutil.permute_rows(self.weight, perm_d)

        self.ii[: len(keep)] = self.ii[keep]
        self.jj[: len(keep)] = self.jj[keep]
        self.age[: len(keep)] = self.age[keep]
        self.exp[: len(keep) * V] = self.exp[
            (keep[:, None] * V + np.arange(V)).reshape(-1)
        ]
        self.f_net = jaxutil.permute_rows(self.f_net, perm_d)
        if self.incremental:
            for l in range(len(self.corr_pyr)):
                self.corr_pyr[l] = jaxutil.permute_rows(self.corr_pyr[l], perm_d)
            if self.corr_scale is not None:
                for l in range(len(self.corr_scale)):
                    self.corr_scale[l] = jaxutil.permute_rows(
                        self.corr_scale[l], perm_d
                    )
        self.n_edges = len(keep)

    def rm_second_newest_keyframe(self, ix: int):
        """Remove keyframe ix (= n_frames-2) from buffer and graph, shifting
        indices (reference :205-230)."""
        self.rm_keyframe(ix)

    def rm_keyframe(self, ix: int, top: int = None):
        """Remove keyframe ``ix`` from buffer and graph, shifting indices.
        ``top``: see :meth:`GraphBuffer.remove_slot` — the speculative
        frontend removes a keyframe AFTER a younger one was appended."""
        V = self.V
        self.buffer.remove_slot(ix, top)

        def shift_exp(exp):
            for col in (0, 3):  # pi, pj frame columns
                exp[exp[:, col] >= ix, col] -= 1
            exp[:, 2] = exp[:, 0] * V + exp[:, 1]  # di = pi·V + qi

        m = (self.ii_inac == ix) | (self.jj_inac == ix)
        self.ii_inac[self.ii_inac >= ix] -= 1
        self.jj_inac[self.jj_inac >= ix] -= 1
        if m.any():
            m_exp = np.repeat(m, V)
            keep_idx = np.where(~m_exp)[0]
            # compact within the capacity buffer (scratch row pads the tail)
            keep_pad = np.full(self._inac_cap + 1, self._inac_cap, np.int64)
            keep_pad[: len(keep_idx)] = keep_idx
            keep_d = jnp.asarray(keep_pad, jnp.int32)
            self.ii_inac = self.ii_inac[~m]
            self.jj_inac = self.jj_inac[~m]
            self.exp_inac = self.exp_inac[~m_exp]
            self.target_inac = _jitted_take_rows(self.target_inac, keep_d)
            self.weight_inac = _jitted_take_rows(self.weight_inac, keep_d)
        shift_exp(self.exp_inac)

        m = (self.ii[: self.n_edges] == ix) | (self.jj[: self.n_edges] == ix)
        self.ii[self.ii >= ix] -= 1
        self.jj[self.jj >= ix] -= 1
        shift_exp(self.exp[: self.n_edges * V])
        self.rm_factors(m, store=False)

    # ---------------------------------------------------------- edge proposal

    def add_neighborhood_factors(self, t0: int, t1: int, r: int = 3):
        """All ordered pairs within radius r (reference :397-411)."""
        ii, jj = np.meshgrid(np.arange(t0, t1), np.arange(t0, t1), indexing="ij")
        ii, jj = ii.reshape(-1), jj.reshape(-1)
        keep = (np.abs(ii - jj) > 0) & (np.abs(ii - jj) <= r)
        self.add_factors(ii[keep], jj[keep])

    def submit_distance_matrix(self, beta: float = 0.25, n_frames=None,
                               window: Optional[int] = None,
                               predict_slot: Optional[int] = None):
        """Enqueue the distance-matrix computation WITHOUT reading it back —
        the frontend submits this speculatively at the end of one keyframe so
        the ~25 ms device→host transfer overlaps the next frames' work
        (readback happens in add_proximity_factors).

        ``window``: only the last ``window`` frames participate (the frontend
        proposes within frontend_window — without this the matrix grows
        O(total²) per pow2 bucket).  Returns (Nb, w0, device-matrix) where
        entry (i, j) covers absolute frames (i + w0, j + w0).

        ``predict_slot``: absolute frame index whose row is overlaid with the
        const-velocity/mean-disp scratch-slot prediction in-program (PRE-STEP
        speculative submission — see ``_jitted_distance_matrix_pred``)."""
        buf = self.buffer
        n = n_frames if n_frames is not None else buf.n_frames
        w0 = max(0, n - window) if window is not None else 0
        Nb = bucket_size(n - w0)
        Nb = min(Nb, buf.buffer_size - w0)
        if self.V > 1:
            d = _jitted_distance_matrix_mv(
                Nb, self.V, buf.poses[w0: w0 + Nb], buf.rig,
                buf.disps[w0 * self.V: (w0 + Nb) * self.V],
                buf.pinhole_grid_intrinsics, jnp.float32(beta),
            )
        elif predict_slot is not None and 2 <= predict_slot - w0 < Nb:
            d = _jitted_distance_matrix_pred(
                Nb, buf.poses[w0: w0 + Nb], buf.disps[w0: w0 + Nb],
                jnp.broadcast_to(buf.pinhole_grid_intrinsics, (Nb, 4)),
                jnp.float32(beta), jnp.int32(predict_slot - w0),
            )
        else:
            d = _jitted_distance_matrix(
                Nb, buf.poses[w0: w0 + Nb], buf.disps[w0: w0 + Nb],
                jnp.broadcast_to(buf.pinhole_grid_intrinsics, (Nb, 4)),
                jnp.float32(beta),
            )
        try:
            # start the device→host transfer NOW so resolving the token a
            # few frames later doesn't pay the tunnel round-trip
            d.copy_to_host_async()
        except Exception:
            pass
        return Nb, w0, d

    def add_proximity_factors(
        self,
        t0: int = 0,
        t1: int = 0,
        rad: int = 2,
        nms: int = 2,
        beta: float = 0.25,
        thresh: float = 16.0,
        remove: bool = False,
        dist_token=None,
    ):
        """Distance-thresholded NMS edge proposal (reference :412-488).

        Neighborhood edges (i-rad-1..i-1 → i, bidirectional) are always added;
        remaining candidate pairs are sorted by frame distance and greedily
        accepted with an L1-ball NMS suppression around accepted edges.
        ``dist_token``: a (Nb, device-matrix) pair from
        ``submit_distance_matrix`` to resolve instead of recomputing.
        """
        t = self.buffer.n_frames
        if t - max(t0, t1) <= 0:
            return
        if (dist_token is not None and dist_token[1] + dist_token[0] >= t
                and dist_token[1] <= min(t0, t1)):
            Nbw, w0, d_dev = dist_token
        else:
            Nbw, w0, d_dev = self.submit_distance_matrix(
                beta, window=t - min(t0, t1)
            )
        t_fetch = time.perf_counter()
        d_full = np.asarray(d_dev).astype(np.float64)
        # the ONE per-keyframe blocking sync left on the frontend hot path:
        # waits for the previous fused step's compute + the matrix transfer
        _pmark("prox_fetch", t_fetch)
        ix = np.arange(t0, t)
        jx = np.arange(t1, t)
        ii, jj = np.meshgrid(ix, jx, indexing="ij")
        ii, jj = ii.reshape(-1), jj.reshape(-1)
        d = d_full[t0 - w0: t - w0, t1 - w0: t - w0].copy()
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

    def _active_expanded(self):
        """Expanded active edges as (EV,) device arrays + validity."""
        EV = self.EV
        n = self.n_edges * self.V
        exp = np.where(
            (np.arange(EV) < n)[:, None], self.exp, 0
        )
        cols = [jnp.asarray(exp[:, c], jnp.int32) for c in range(5)]
        ev = jnp.asarray(np.arange(EV) < n)
        return (*cols, ev)

    def _grid(self):
        return jnp.stack(
            jnp.meshgrid(
                jnp.arange(self.wd, dtype=jnp.float32),
                jnp.arange(self.ht, dtype=jnp.float32),
                indexing="xy",
            ),
            axis=-1,
        )

    def _rig_intr(self):
        """(rig (V,7), per-view scaled intrinsics (V,D)) device arrays."""
        buf = self.buffer
        intr = buf.scaled_intrinsics
        if intr.ndim == 1:
            intr = intr[None]
        rig = getattr(buf, "rig", None)
        if rig is None:
            rig = jnp.broadcast_to(
                jnp.asarray([0, 0, 0, 0, 0, 0, 1], jnp.float32), (1, 7)
            )
        return rig, intr

    def _run_update_fn(self, f_net, coords1, target_prev, di_d, dj_d,
                       edge_valid, corr_feat, num_seg):
        """Shared GRU update: motion features → update_fn → target/weight.

        Padded edges are routed to a trash aggregation segment (index
        ``num_seg``) so they cannot pollute the per-variable damping mean.
        """
        motn = jnp.concatenate(
            [coords1 - self._grid(), target_prev - coords1], axis=-1
        ).clip(-64.0, 64.0)

        inp = self.buffer.inps[di_d].astype(jnp.float32)
        ix = jnp.where(edge_valid, di_d, num_seg).astype(jnp.int32)
        net, delta, weight, eta = self.update_fn(
            self.params, f_net, inp, corr_feat, motn, ix, dj_d, num_seg + 1
        )
        bad = self.buffer.masks[di_d][..., None] | (~edge_valid)[:, None, None, None]
        weight = jnp.where(bad, 0.0, weight)
        target = coords1 + delta
        return net, target, weight, eta[:num_seg]

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

        EV = self.EV
        pi_d, qi_d, di_d, pj_d, qj_d, ev = self._active_expanded()
        Nb = bucket_size(self.buffer.n_frames)
        NbV = Nb * self.V
        buf = self.buffer
        rig, intr = self._rig_intr()
        if getattr(self.update_fn, "host_only", False):
            coords1, _ = geom.reproject_mv(
                buf.poses, rig, buf.disps, intr, buf.camera_type,
                pi_d, qi_d, di_d, pj_d, qj_d,
            )
            corr_feat = corr_ops.corr_lookup_pyramid(
                [p[:EV] for p in self._pyr_list()],
                coords1, CORR_RADIUS,
            )
            dj_d = pj_d * self.V + qj_d
            net, target, weight, eta = self._run_update_fn(
                self.f_net[:EV], coords1, self.target[:EV], di_d, dj_d, ev,
                corr_feat, NbV,
            )
        else:
            step = _jitted_gru_step(self.update_fn, buf.camera_type)
            # full pyramids passed in; the EV-row slice happens in-program
            # (an eager slice copies the whole volume set per call)
            net, target, weight, eta = step(
                self.params, NbV, buf.poses[:Nb], rig, buf.disps[:NbV],
                intr, self._pyr_list(),
                self.target[:EV], self.f_net[:EV], buf.inps[:NbV],
                buf.masks[:NbV], pi_d, qi_d, di_d, pj_d, qj_d, ev,
            )
        self.f_net = jaxutil.set_prefix(self.f_net, net)
        self.target = jaxutil.set_prefix(self.target, target)
        self.weight = jaxutil.set_prefix(self.weight, weight)
        # overwrite damping rows for source disp vars present in the graph
        src = np.unique(self.exp[: self.n_edges * self.V, 2])
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

    def update_fused(
        self,
        rounds: int,
        t0: Optional[int] = None,
        t1: Optional[int] = None,
        itrs: int = 3,
        use_inactive: bool = False,
        fixed_motion: bool = False,
        motion_only: bool = False,
        limited_disp: bool = False,
    ):
        """``rounds`` × (GRU → BA) as ONE device dispatch (frontend hot path
        and the inner filler's 10 motion-only rounds).

        Semantically equal to ``rounds`` successive ``update()`` calls with
        frontend damping (1e-3/0.1); oracle update_fns (host_only) and the
        multi-view rig path fall back to the loop."""
        assert self.incremental and self.n_edges > 0
        st = getattr(self.buffer, "sparse_tracks", None)
        if (getattr(self.update_fn, "host_only", False)
                or (st is not None and st.enabled)):
            for _ in range(rounds):
                self.update(t0=t0, t1=t1, itrs=itrs, use_inactive=use_inactive,
                            fixed_motion=fixed_motion,
                            motion_only=motion_only, limited_disp=limited_disp)
            return

        if self.V > 1:
            cfg, Nb, base, args = self._fused_prep_mv(
                t0, t1, use_inactive, fixed_motion,
                motion_only=motion_only, limited_disp=limited_disp,
            )
            run = _jitted_fused_rounds_mv(self.update_fn, cfg, rounds)
            (poses, rig, disps, intr, f_net, target, weight, damping) = run(
                self.params, Nb, *args, jnp.int32(itrs),
                jnp.float32(1e-3), jnp.float32(0.1),
            )
            self._apply_fused_mv(cfg, base, poses, rig, disps, intr, f_net,
                                 target, weight, damping)
            self.age[: self.n_edges] += rounds
            return

        buf = self.buffer
        cfg, Nb, base, args = self._fused_prep(
            t0, t1, use_inactive, fixed_motion,
            motion_only=motion_only, limited_disp=limited_disp,
        )
        run = _jitted_fused_rounds(self.update_fn, cfg, rounds)
        (poses, disps, intr, f_net, target, weight, damping) = run(
            self.params, Nb, *args, jnp.int32(itrs),
            jnp.float32(1e-3), jnp.float32(0.1),
        )
        self._apply_fused(base, poses, disps, intr, f_net, target, weight,
                          damping)
        self.age[: self.n_edges] += rounds

    def _fused_prep(self, t0, t1, use_inactive, fixed_motion, Nb=None,
                    motion_only=False, limited_disp=False,
                    extra_slots: int = 0):
        """Shared host-side argument assembly for the fused programs:
        active/inactive edge blocks, per-source slots, masks, BAConfig.

        WINDOWED: frame indices are shifted by ``base`` (the smallest frame
        any BA edge touches) so the program size follows the live window,
        not the total keyframe count — the reference's sparse solver only
        materializes variables present in the edge list (buffer.py:373-430);
        a dense system over all frames would grow per pow2 bucket forever.
        Returns (cfg, Nb, base, args)."""
        act_ii = self.ii[: self.n_edges]
        act_jj = self.jj[: self.n_edges]
        if t0 is None:
            t0 = int(max(1, act_ii.min() + 1))
        if t1 is None:
            t1 = int(max(act_ii.max(), act_jj.max()) + 1)

        buf = self.buffer
        E = self.max_factors

        # inactive block, bucket-padded so compile keys repeat across calls
        if use_inactive:
            m = (self.ii_inac >= t0 - 3) & (self.jj_inac >= t0 - 3)
            inac_idx = np.where(m)[0]
        else:
            inac_idx = np.zeros((0,), np.int64)
        K = len(inac_idx)
        Kb = bucket_size(K, minimum=4) if K else 0
        if Kb:
            sel_pad = np.zeros(Kb, np.int64)
            sel_pad[:K] = inac_idx
            # gather happens INSIDE the fused program (an eager gather here
            # serializes against the donated graph buffers)
            sel_d = jnp.asarray(sel_pad, jnp.int32)
            ii_in = self.ii_inac[sel_pad]
            jj_in = self.jj_inac[sel_pad]
        else:
            sel_d = jnp.zeros((0,), jnp.int32)
            ii_in = jj_in = np.zeros((0,), np.int64)

        # window base + size
        frames_touched = np.concatenate(
            [ii_in[:K], jj_in[:K], act_ii, act_jj]
        )
        base = int(frames_touched.min()) if len(frames_touched) else 0
        top = int(frames_touched.max()) + 1 if len(frames_touched) else 1
        top = max(top, t1) + extra_slots
        if Nb is None:
            Nb = bucket_size(top - base)
        base = min(base, buf.buffer_size - Nb)
        base = max(base, 0)

        ii_act_w = np.where(np.arange(E) < self.n_edges, self.ii[:E], base) - base
        jj_act_w = np.where(np.arange(E) < self.n_edges, self.jj[:E], base) - base
        ii_d = jnp.asarray(ii_act_w, jnp.int32)
        jj_d = jnp.asarray(jj_act_w, jnp.int32)
        ev = jnp.asarray(np.arange(E) < self.n_edges)

        L = Kb + E  # combined BA edge count (static per (Kb,) bucket)
        ii_ba = np.zeros(L, np.int64)
        jj_ba = np.zeros(L, np.int64)
        ev_ba = np.zeros(L, bool)
        ii_ba[:Kb] = ii_in - base
        jj_ba[:Kb] = jj_in - base
        ev_ba[:K] = True
        ii_ba[Kb:] = ii_act_w
        jj_ba[Kb:] = jj_act_w
        ev_ba[Kb: Kb + self.n_edges] = True
        ii_ba = np.clip(ii_ba, 0, Nb - 1)
        jj_ba = np.clip(jj_ba, 0, Nb - 1)

        valid_ii = np.concatenate([ii_in[:K] - base, act_ii - base])
        fill = np.bincount(valid_ii, minlength=Nb).max() if len(valid_ii) else 1
        M = bucket_size(int(fill), minimum=8)
        # slots over the combined list: valid rows are [0:K] and [Kb:Kb+n_edges]
        slot_src = np.full(L, -1, np.int64)
        slot_src[:K] = ii_in[:K] - base
        slot_src[Kb: Kb + self.n_edges] = act_ii - base
        slot_edge = np.full((Nb, M), L, np.int32)
        fill_ct = np.zeros(Nb, np.int64)
        for e, i in enumerate(slot_src):
            if i < 0 or i >= Nb:
                continue
            slot_edge[i, fill_ct[i]] = e
            fill_ct[i] += 1

        idx = np.arange(Nb) + base
        if fixed_motion:
            pose_mask = np.zeros(Nb, bool)
        else:
            pose_mask = (idx >= t0) & (idx < t1) & (idx < buf.n_frames)
        # disps update ONLY where a BA edge sources from the frame — the
        # reference materializes dense_disp variables from the edge list
        # (buffer.py:373-430); anchoring edgeless frames to disps_sens each
        # call would drift them
        has_edge = fill_ct > 0
        if motion_only:
            disp_mask = np.zeros(Nb, bool)
        elif limited_disp:
            disp_mask = has_edge & (idx >= t0) & (idx < t1) & (idx < buf.n_frames)
        else:
            disp_mask = has_edge & (idx < buf.n_frames)

        src = np.unique(act_ii - base)
        src_rows = np.full(Nb, Nb, np.int64)
        src_rows[: len(src)] = src

        cfg = ba.BAConfig(
            camera_type=buf.camera_type, ht=self.ht, wd=self.wd,
            optimize_intrinsics=self.optimize_intrinsics,
            alpha=buf.dense_disp_alpha, max_edges_per_frame=M,
            **self.ba_cfg_kwargs,
        )
        b = base
        args = (
            buf.poses[b: b + Nb], buf.disps[b: b + Nb], buf.intrinsics,
            # FULL (EV+1)-row pyramids: the E-row slice happens INSIDE the
            # jitted program.  An eager p[:E] here dispatches a device copy
            # of the whole ~1.2 GB volume set per keyframe — the dominant
            # transient behind the 4-video volume-mode OOM (two in-flight
            # copies/video under the depth-2 pipeline).
            self._pyr_list(), self.target[:E], self.f_net[:E],
            buf.inps[b: b + Nb], buf.masks[b: b + Nb], ii_d, jj_d, ev,
            self.damping[b: b + Nb],
            self.target_inac, self.weight_inac, sel_d,
            jnp.asarray(ii_ba, jnp.int32), jnp.asarray(jj_ba, jnp.int32),
            jnp.asarray(ev_ba), jnp.asarray(slot_edge),
            jnp.asarray(src_rows, jnp.int32),
            jnp.asarray(pose_mask), jnp.asarray(disp_mask),
            (jnp.zeros((Nb, self.ht * self.wd)) if motion_only
             else buf.disps_sens[b: b + Nb].reshape(Nb, -1)),
        )
        return cfg, Nb, base, args

    def _apply_fused(self, base, poses, disps, intr, f_net, target, weight,
                     damping):
        buf = self.buffer
        buf.poses = jaxutil.set_rows(buf.poses, base, poses)
        buf.disps = jaxutil.set_rows(buf.disps, base, disps)
        if self.optimize_intrinsics:
            buf.intrinsics = intr
        self.f_net = jaxutil.set_prefix(self.f_net, f_net)
        self.target = jaxutil.set_prefix(self.target, target)
        self.weight = jaxutil.set_prefix(self.weight, weight)
        self.damping = jaxutil.set_rows(self.damping, base, damping)

    def _fused_prep_mv(self, t0, t1, use_inactive, fixed_motion, Nb=None,
                       motion_only=False, limited_disp=False,
                       extra_slots: int = 0):
        """Rig-aware ``_fused_prep``: assembles EXPANDED (frame, view) edge
        blocks over the windowed frame range for the mv fused programs.
        Frame indices shift by ``base``; disp/inp/mask/damping/sens rows are
        slot-major (frame·V + view).  Returns (cfg, Nb, base, args)."""
        V = self.V
        act_ii = self.ii[: self.n_edges]
        act_jj = self.jj[: self.n_edges]
        if t0 is None:
            t0 = int(max(1, act_ii.min() + 1))
        if t1 is None:
            t1 = int(max(act_ii.max(), act_jj.max()) + 1)

        buf = self.buffer
        E = self.max_factors
        EV = E * V
        nV = self.n_edges * V

        if use_inactive:
            m = (self.ii_inac >= t0 - 3) & (self.jj_inac >= t0 - 3)
            inac_idx = np.where(m)[0]
        else:
            inac_idx = np.zeros((0,), np.int64)
        K = len(inac_idx)
        Kb = bucket_size(K, minimum=4) if K else 0
        KV, KbV = K * V, Kb * V
        if KbV:
            rows = (inac_idx[:, None] * V + np.arange(V)).reshape(-1)
            sel_pad = np.zeros(KbV, np.int64)
            sel_pad[:KV] = rows
            sel_d = jnp.asarray(sel_pad, jnp.int32)
            exp_in = np.zeros((KbV, 5), np.int64)
            exp_in[:KV] = self.exp_inac[rows]
        else:
            sel_d = jnp.zeros((0,), jnp.int32)
            exp_in = np.zeros((0, 5), np.int64)

        # window base + size over FRAMES
        frames_touched = np.concatenate(
            [exp_in[:KV, 0], exp_in[:KV, 3], act_ii, act_jj]
        )
        base = int(frames_touched.min()) if len(frames_touched) else 0
        top = int(frames_touched.max()) + 1 if len(frames_touched) else 1
        top = max(top, t1) + extra_slots
        if Nb is None:
            Nb = bucket_size(top - base)
        base = min(base, buf.buffer_size - Nb)
        base = max(base, 0)
        NbV = Nb * V

        def _localize(exp_abs, valid_n):
            """Absolute (pi,qi,di,pj,qj) rows → window-local, clipped."""
            out = np.zeros_like(exp_abs)
            pi = np.clip(np.where(np.arange(len(exp_abs)) < valid_n,
                                  exp_abs[:, 0], base) - base, 0, Nb - 1)
            pj = np.clip(np.where(np.arange(len(exp_abs)) < valid_n,
                                  exp_abs[:, 3], base) - base, 0, Nb - 1)
            out[:, 0] = pi
            out[:, 1] = np.where(np.arange(len(exp_abs)) < valid_n,
                                 exp_abs[:, 1], 0)
            out[:, 3] = pj
            out[:, 4] = np.where(np.arange(len(exp_abs)) < valid_n,
                                 exp_abs[:, 4], 0)
            out[:, 2] = out[:, 0] * V + out[:, 1]
            return out

        exp_act = np.zeros((EV, 5), np.int64)
        exp_act[:nV] = self.exp[:nV]
        exp_act_l = _localize(exp_act, nV)
        ev_act = np.arange(EV) < nV

        # combined BA edge list: [inactive (KbV) ++ active (EV)]
        L = KbV + EV
        exp_ba = np.concatenate([_localize(exp_in, KV), exp_act_l], 0)
        ev_ba = np.zeros(L, bool)
        ev_ba[:KV] = True
        ev_ba[KbV: KbV + nV] = True

        # per-slot edge grouping for the Schur assembly
        valid_rows = np.where(ev_ba)[0]
        fill = (
            np.bincount(exp_ba[valid_rows, 2], minlength=NbV).max()
            if len(valid_rows) else 1
        )
        M = bucket_size(int(fill), minimum=8)
        slot_edge = np.full((NbV, M), L, np.int32)
        fill_ct = np.zeros(NbV, np.int64)
        for r in valid_rows:
            d = exp_ba[r, 2]
            slot_edge[d, fill_ct[d]] = r
            fill_ct[d] += 1

        idx = np.arange(Nb) + base
        if fixed_motion:
            pose_mask = np.zeros(Nb, bool)
        else:
            pose_mask = (idx >= t0) & (idx < t1) & (idx < buf.n_frames)
        idv = np.arange(NbV) // V + base
        has_edge = fill_ct > 0
        if motion_only:
            disp_mask = np.zeros(NbV, bool)
        elif limited_disp:
            disp_mask = has_edge & (idv >= t0) & (idv < t1) \
                & (idv < buf.n_frames)
        else:
            disp_mask = has_edge & (idv < buf.n_frames)

        src = np.unique(exp_act_l[:nV, 2]) if nV else np.zeros(0, np.int64)
        src_rows = np.full(NbV, NbV, np.int64)
        src_rows[: len(src)] = src

        cfg = ba.BAConfig(
            camera_type=buf.camera_type, ht=self.ht, wd=self.wd,
            optimize_intrinsics=self.optimize_intrinsics and not motion_only,
            alpha=buf.dense_disp_alpha, max_edges_per_frame=M,
            n_views=V,
            optimize_rig=self.optimize_rig and not motion_only,
            **self.ba_cfg_kwargs,
        )
        rig, _ = self._rig_intr()
        # FULL-res per-view intrinsics: the round runner scales to the /8
        # grid itself (and BA consumes full-res)
        intr = (
            buf.intrinsics if buf.intrinsics.ndim == 2
            else buf.intrinsics[None]
        )
        b, bV = base, base * V
        act_cols = [jnp.asarray(exp_act_l[:, c], jnp.int32) for c in range(5)]
        ba_cols = [jnp.asarray(exp_ba[:, c], jnp.int32) for c in range(5)]
        args = (
            buf.poses[b: b + Nb], rig, buf.disps[bV: bV + NbV], intr,
            self._pyr_list(), self.target[:EV], self.f_net[:EV],
            buf.inps[bV: bV + NbV], buf.masks[bV: bV + NbV],
            *act_cols, jnp.asarray(ev_act),
            self.damping[bV: bV + NbV],
            self.target_inac, self.weight_inac, sel_d,
            *ba_cols, jnp.asarray(ev_ba), jnp.asarray(slot_edge),
            jnp.asarray(src_rows, jnp.int32),
            jnp.asarray(pose_mask), jnp.asarray(disp_mask),
            (jnp.zeros((NbV, self.ht * self.wd)) if motion_only
             else buf.disps_sens[bV: bV + NbV].reshape(NbV, -1)),
        )
        return cfg, Nb, base, args

    def _apply_fused_mv(self, cfg, base, poses, rig, disps, intr, f_net,
                        target, weight, damping):
        buf = self.buffer
        V = self.V
        buf.poses = jaxutil.set_rows(buf.poses, base, poses)
        buf.disps = jaxutil.set_rows(buf.disps, base * V, disps)
        if self.optimize_intrinsics:
            buf.intrinsics = (
                intr if buf.intrinsics.ndim == 2 else intr[0]
            )
        if cfg.optimize_rig:
            buf.rig = rig
        self.f_net = jaxutil.set_prefix(self.f_net, f_net)
        self.target = jaxutil.set_prefix(self.target, target)
        self.weight = jaxutil.set_prefix(self.weight, weight)
        self.damping = jaxutil.set_rows(self.damping, base * V, damping)

    def frontend_step_fused(
        self,
        r1: int,
        r2: int,
        d_pair,
        kf_thresh: float,
        beta: float,
        slot_t1: int,
        const_vel: bool,
        t0=None,
        t1=None,
        itrs: int = 3,
        fixed_motion: bool = False,
        defer: bool = False,
    ):
        """One dispatch for the whole per-keyframe frontend optimization:
        r1 rounds -> removal distance (d_pair, bidirectional max) ->
        conditionally r2 more rounds + next-slot init (frontend.py:97-124).
        Returns the distance as a python float — the ONE host sync.

        ``defer=True`` skips the blocking readback: the device scalar is
        returned with an async copy in flight, and the caller MUST later pass
        it to :meth:`finish_fused_step` (before any topology change) to apply
        the edge-age bookkeeping.  Device state is already branch-correct
        either way (the keep/remove split ran under ``lax.cond`` in-program).

        Caller contract: only valid on the fast path (traceable update_fn,
        no sparse tracks); check ``can_fuse_frontend_step``."""
        # +2 slots: the distance check reads slot_t1-? and the keep-branch
        # initializes the NEXT keyframe slot in-program
        if self.V > 1:
            cfg, Nb, base, args = self._fused_prep_mv(
                t0, t1, True, fixed_motion, extra_slots=2,
            )
            assert base <= min(d_pair) and slot_t1 - base < Nb, (
                base, d_pair, slot_t1, Nb
            )
            run = _jitted_frontend_step_mv(
                self.update_fn, cfg, r1, r2, const_vel
            )
            (poses, rig, disps, intr, f_net, target, weight, damping, d) = (
                run(
                    self.params, Nb, *args, jnp.int32(itrs),
                    jnp.float32(1e-3), jnp.float32(0.1),
                    jnp.int32(d_pair[0] - base), jnp.int32(d_pair[1] - base),
                    jnp.float32(kf_thresh), jnp.float32(beta),
                    jnp.int32(slot_t1 - base),
                )
            )
            self._apply_fused_mv(cfg, base, poses, rig, disps, intr, f_net,
                                 target, weight, damping)
            if defer:
                try:
                    d.copy_to_host_async()
                except Exception:
                    pass
                return d
            return self.finish_fused_step(d, r1, r2, kf_thresh)
        cfg, Nb, base, args = self._fused_prep(
            t0, t1, True, fixed_motion, extra_slots=2,
        )
        assert base <= min(d_pair) and slot_t1 - base < Nb, (
            base, d_pair, slot_t1, Nb
        )
        run = _jitted_frontend_step(
            self.update_fn, cfg, r1, r2, const_vel
        )
        (poses, disps, intr, f_net, target, weight, damping, d) = run(
            self.params, Nb, *args, jnp.int32(itrs),
            jnp.float32(1e-3), jnp.float32(0.1),
            jnp.asarray([d_pair[0] - base], jnp.int32),
            jnp.asarray([d_pair[1] - base], jnp.int32),
            jnp.float32(kf_thresh), jnp.float32(beta),
            jnp.int32(slot_t1 - base),
        )
        self._apply_fused(base, poses, disps, intr, f_net, target, weight,
                          damping)
        if defer:
            try:
                d.copy_to_host_async()
            except Exception:
                pass
            return d
        return self.finish_fused_step(d, r1, r2, kf_thresh)

    def finish_fused_step(self, d, r1: int, r2: int,
                          kf_thresh: float, bump_ages: bool = True) -> float:
        """Blockingly read a (possibly deferred) fused-step distance and
        apply the decision-dependent edge-age bookkeeping.

        ``bump_ages=False``: the caller already bumped ages optimistically
        at submit time (speculative pipelining — the ages must be current
        BEFORE this resolve because a younger keyframe's ``rm_factors(age)``
        ran in between)."""
        t0 = time.perf_counter()
        d = float(d)
        _pmark("removal_fetch", t0)
        if bump_ages:
            self.age[: self.n_edges] += r1 + (r2 if d >= kf_thresh else 0)
        return d

    @property
    def can_fuse_frontend_step(self) -> bool:
        st = getattr(self.buffer, "sparse_tracks", None)
        return (
            self.incremental
            and not getattr(self.update_fn, "host_only", False)
            and (st is None or not st.enabled)
        )

    def current_residual(self):
        """Weighted flow residual Σ w·(reproj − target)² over the active
        edges — fills SLAMOutput.ba_residual (the reference declares the
        field but never computes it, interface.py:152-154).  Jitted: the
        eager reproject chain is ~40 primitives ≈ 40 tunnel dispatches."""
        if self.n_edges == 0:
            return 0.0
        pi_d, qi_d, di_d, pj_d, qj_d, ev = self._active_expanded()
        buf = self.buffer
        rig, intr = self._rig_intr()
        return float(_jitted_residual(
            buf.camera_type, buf.poses, rig, buf.disps, intr,
            pi_d, qi_d, di_d, pj_d, qj_d, ev,
            self.target[: self.EV], self.weight[: self.EV],
        ))

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

        V = self.V
        NbV = Nb * V
        buf = self.buffer
        st = getattr(buf, "sparse_tracks", None)
        fast = not getattr(self.update_fn, "host_only", False)
        if fast and (st is None or not st.enabled):
            # the whole multi-step refresh+BA as one dispatch
            self._update_batch_fused(
                itrs, steps, frame_chunks, optimize_intrinsics
            )
            return

        # fallback (oracle update_fns / sparse tracks): per-step loop with
        # cached materialized chunk pyramids
        chunk_cache = {}
        chunk_step = (
            _jitted_backend_chunk(self.update_fn, buf.camera_type)
            if fast else None
        )
        for _ in range(steps):
            t_prep = time.perf_counter()
            # refresh per step: BA may have updated intrinsics/rig, and the
            # reference reprojects with the CURRENT values each update
            rig, intr = self._rig_intr()
            pi_d, qi_d, di_d, pj_d, qj_d, ev = self._active_expanded()
            _pmark("ub_prep", t_prep)
            if not fast:
                coords1, valid1 = geom.reproject_mv(
                    buf.poses, rig, buf.disps, intr, buf.camera_type,
                    pi_d, qi_d, di_d, pj_d, qj_d,
                )

            for ci, sel in enumerate(frame_chunks):
                t_ck = time.perf_counter()
                sel_exp = (sel[:, None] * V + np.arange(V)).reshape(-1)
                Cb = bucket_size(len(sel_exp), minimum=min(BACKEND_CHUNK, 16))
                # padding rows route to the SCRATCH row EV — padding with 0
                # would scatter the masked rows' zero weight over edge 0
                sel_pad = np.full(Cb, self.EV, np.int64)
                sel_pad[: len(sel_exp)] = sel_exp
                sl = jnp.asarray(sel_pad, jnp.int32)
                cv = jnp.asarray(np.arange(Cb) < len(sel_exp))
                if ci not in chunk_cache:
                    dj_d = jnp.asarray(np.where(
                        np.arange(self.EV) < self.n_edges * V,
                        self.exp[:, 3] * V + self.exp[:, 4], 0,
                    ), jnp.int32)
                    chunk_cache[ci] = _jitted_edge_corr(
                        self.corr_levels, buf.fmaps, di_d[sl], dj_d[sl]
                    )
                pyr = chunk_cache[ci]
                if fast:
                    net, target, weight, eta = chunk_step(
                        self.params, NbV, buf.poses[:Nb], rig,
                        buf.disps[:NbV], intr, pyr,
                        self.f_net, self.target, buf.inps[:NbV],
                        buf.masks[:NbV], sl, pi_d[sl], qi_d[sl], di_d[sl],
                        pj_d[sl], qj_d[sl], ev[sl] & cv,
                    )
                else:
                    corr_feat = corr_ops.corr_lookup_pyramid(
                        pyr, coords1[sl],
                        CORR_RADIUS,
                    )
                    dj_sl = pj_d[sl] * V + qj_d[sl]
                    net, target, weight, eta = self._run_update_fn(
                        self.f_net[sl], coords1[sl], self.target[sl],
                        di_d[sl], dj_sl, ev[sl] & cv, corr_feat, NbV,
                    )
                self.f_net = jaxutil.set_rows_at(self.f_net, sl, net)
                self.target = jaxutil.set_rows_at(self.target, sl, target)
                self.weight = jaxutil.set_rows_at(self.weight, sl, weight)
                src = np.unique(self.exp[sel_exp, 2])
                src_d = jnp.asarray(src, jnp.int32)
                self.damping = jaxutil.set_rows_at(self.damping, src_d, eta[src_d])
                _pmark("ub_chunk_enq", t_ck)
            t_sync = time.perf_counter()
            _pmark("ub_chunks_sync", t_sync, sync_val=self.damping if _PROF_FG else None)

            t_ba = time.perf_counter()
            self._bundle_adjustment(
                1, t, itrs,
                use_inactive=False, motion_only=False, fixed_motion=False,
                limited_disp=False,
                pose_damping=1e-5, pose_ep=1e-2,
                optimize_intrinsics=optimize_intrinsics,
            )
            _pmark("ub_ba_enq", t_ba)
            t_sync = time.perf_counter()
            _pmark("ub_ba_sync", t_sync,
                   sync_val=self.buffer.poses if _PROF_FG else None)
        _pdump(f"[update_batch t={t} E={self.n_edges} steps={steps} "
               f"chunks={len(frame_chunks)}]")

    def _update_batch_fused(self, itrs, steps, frame_chunks,
                            optimize_intrinsics):
        """Host-side argument assembly for ``_jitted_backend_steps`` — runs
        the whole backend pass in one dispatch.  Topology is static across
        steps, so every index array is built and uploaded exactly once."""
        buf = self.buffer
        V = self.V
        t = buf.n_frames
        Nb = bucket_size(t)
        NbV = Nb * V
        EV = self.EV
        P = self.ht * self.wd
        t_prep = time.perf_counter()

        exp_chunks = [
            (sel[:, None] * V + np.arange(V)).reshape(-1)
            for sel in frame_chunks
        ]
        Cb = bucket_size(
            max(len(c) for c in exp_chunks),
            minimum=min(BACKEND_CHUNK, 16),
        )
        C = bucket_size(len(exp_chunks), minimum=1)
        # padding rows route to the stores' scratch row EV / damping scratch
        # row NbV; all-padding chunks compute garbage that lands there too
        sl_stk = np.full((C, Cb), EV, np.int64)
        cv_stk = np.zeros((C, Cb), bool)
        srcs = [np.unique(self.exp[c, 2]) for c in exp_chunks]
        Sb = bucket_size(max(len(s) for s in srcs), minimum=4)
        src_stk = np.full((C, Sb), NbV, np.int64)
        for k, c in enumerate(exp_chunks):
            sl_stk[k, : len(c)] = c
            cv_stk[k, : len(c)] = True
            src_stk[k, : len(srcs[k])] = srcs[k]

        # BA edge layout == the active store rows (use_inactive is never set
        # on the backend path; empty-slot marker EV)
        exp = np.where(
            (np.arange(EV) < self.n_edges * V)[:, None], self.exp, 0
        )
        ev_all = np.arange(EV) < self.n_edges * V
        fill = (
            np.bincount(exp[ev_all, 2], minlength=NbV).max()
            if self.n_edges else 1
        )
        M = bucket_size(int(fill), minimum=8)
        slot_edge = np.full((NbV, M), EV, np.int32)
        fill_ct = np.zeros(NbV, np.int64)
        for r in np.where(ev_all)[0]:
            d = exp[r, 2]
            slot_edge[d, fill_ct[d]] = r
            fill_ct[d] += 1

        idx = np.arange(Nb)
        pose_mask = (idx >= 1) & (idx < t)
        idv = np.arange(NbV) // V
        disp_mask = (fill_ct > 0) & (idv < t)

        cfg = ba.BAConfig(
            camera_type=buf.camera_type, ht=self.ht, wd=self.wd,
            optimize_intrinsics=optimize_intrinsics,
            alpha=buf.dense_disp_alpha, max_edges_per_frame=M, n_views=V,
            optimize_rig=self.optimize_rig,
            **self.ba_cfg_kwargs,
        )
        rig, _ = self._rig_intr()
        intr = (
            buf.intrinsics if buf.intrinsics.ndim == 2
            else buf.intrinsics[None]
        )
        sens = buf.disps_sens[:NbV].reshape(NbV, P)
        sens_mask = (jnp.sum(sens, axis=1) > 0).astype(jnp.float32)
        damping = jnp.concatenate(
            [self.damping[:NbV], jnp.zeros((1, self.ht, self.wd))], 0
        )
        cols = [jnp.asarray(exp[:, c], jnp.int32) for c in range(5)]
        _pmark("ubf_prep", t_prep)

        t_run = time.perf_counter()
        run = _jitted_backend_steps(self.update_fn, cfg,
                                    self.corr_mode == "alt")
        (poses, rig_new, disps, intr_new, f_net, target, weight, damping) = (
            run(
                self.params, NbV, buf.poses[:Nb], rig, buf.disps[:NbV], intr,
                buf.fmaps[:NbV], buf.inps[:NbV], buf.masks[:NbV],
                self.f_net, self.target, self.weight, damping,
                *cols, jnp.asarray(ev_all),
                jnp.asarray(sl_stk, jnp.int32), jnp.asarray(cv_stk),
                jnp.asarray(src_stk, jnp.int32),
                jnp.asarray(slot_edge), jnp.asarray(pose_mask),
                jnp.asarray(disp_mask), sens, sens_mask,
                jnp.int32(steps), jnp.int32(itrs),
                jnp.float32(1e-5), jnp.float32(1e-2),
            )
        )
        buf.poses = jaxutil.set_prefix(buf.poses, poses)
        buf.disps = jaxutil.set_prefix(buf.disps, disps)
        self.f_net = f_net
        self.target = target
        self.weight = weight
        self.damping = jaxutil.set_prefix(self.damping, damping[:NbV])
        if optimize_intrinsics:
            buf.intrinsics = (
                intr_new if buf.intrinsics.ndim == 2 else intr_new[0]
            )
        if cfg.optimize_rig:
            buf.rig = rig_new
        _pmark("ubf_run_enq", t_run)
        t_sync = time.perf_counter()
        _pmark("ubf_sync", t_sync, sync_val=buf.poses if _PROF_FG else None)
        _pdump(f"[update_batch_fused t={t} E={self.n_edges} steps={steps} "
               f"chunks={len(frame_chunks)}->{C}x{Cb}]")

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
        """Pad active (+eligible inactive) expanded edges and run the jitted
        BA solve (reference buffer.bundle_adjustment, buffer.py:373-525).

        Edge-row layout: [0:K) selected inactive, [K:Kb) padding,
        [Kb:Kb+EV) the FULL active store (valid where row < n_edges·V).
        The inactive gather + concat happens inside a jitted packer — an
        eager gather here serializes against the donated graph buffers.
        """
        buf = self.buffer
        V = self.V
        t_bprep = time.perf_counter()
        weight_dense_disp = 0.001  # buffer.py:396

        act_exp = self.exp[: self.n_edges * V]
        if use_inactive:
            m = (self.ii_inac >= t0 - 3) & (self.jj_inac >= t0 - 3)
            m_exp = np.repeat(m, V)
            inac_rows = np.where(m_exp)[0]
        else:
            inac_rows = np.zeros((0,), np.int64)
        K = len(inac_rows)
        Kb = bucket_size(K, minimum=4) if K else 0
        EV = self.EV
        Eb = Kb + EV
        Nb = bucket_size(buf.n_frames)
        NbV = Nb * V
        P = self.ht * self.wd

        sel_pad = np.zeros(max(Kb, 1), np.int64)[:Kb]
        sel_pad[:K] = inac_rows
        exp_pad = np.zeros((Eb, 5), np.int64)
        exp_pad[:K] = self.exp_inac[inac_rows]
        exp_pad[Kb: Kb + self.n_edges * V] = act_exp
        ev = np.zeros(Eb, bool)
        ev[:K] = True
        ev[Kb: Kb + self.n_edges * V] = True
        Etot = K + self.n_edges * V

        target, weight = _jitted_pack_ba_edges(
            Kb, self.target_inac, self.weight_inac,
            jnp.asarray(sel_pad, jnp.int32), self.target, self.weight,
            jnp.float32(weight_dense_disp),
        )

        # sparse-tracks flow term: duplicated edge rows with splatted
        # keypoint targets (reference buffer.py:422-449 adds a second
        # DenseDepthFlowTerm over the same edges, weight_tracks = 0.001)
        st = getattr(buf, "sparse_tracks", None)
        if st is not None and st.enabled and not motion_only:
            weight_tracks = 0.001  # buffer.py:396
            t_trk, w_trk = st.compute_dense_disp_target_weight(
                source_view_inds=exp_pad[:, 1],
                source_frame_inds=buf.tstamp[exp_pad[:, 0]],
                target_view_inds=exp_pad[:, 4],
                target_frame_inds=buf.tstamp[exp_pad[:, 3]],
                image_size=(buf.height, buf.width),
                dense_disp_size=(self.ht, self.wd),
            )
            trk_valid = ev & (w_trk.reshape(Eb, -1).sum(1) > 0)
            target = jnp.concatenate(
                [target, jnp.asarray(t_trk.reshape(Eb, P, 2))], 0
            )
            weight = jnp.concatenate(
                [weight,
                 jnp.asarray(w_trk.reshape(Eb, P, 2)) * weight_tracks], 0
            )
            exp_pad = np.concatenate([exp_pad, exp_pad], 0)
            ev = np.concatenate([ev, trk_valid])
            Eb = 2 * Eb

        # per-disp-variable slot grouping for the Schur assembly
        valid_rows = np.where(ev)[0]
        fill = (
            np.bincount(exp_pad[valid_rows, 2], minlength=NbV).max()
            if Etot else 1
        )
        M = bucket_size(int(fill), minimum=8)
        # slots hold ROW indices in the padded layout; Eb marks empty
        slot_edge = np.full((NbV, M), Eb, np.int32)
        fill_ct = np.zeros(NbV, np.int64)
        for r in valid_rows:
            d = exp_pad[r, 2]
            slot_edge[d, fill_ct[d]] = r
            fill_ct[d] += 1

        cfg = ba.BAConfig(
            camera_type=buf.camera_type,
            ht=self.ht,
            wd=self.wd,
            optimize_intrinsics=optimize_intrinsics,
            alpha=buf.dense_disp_alpha,
            max_edges_per_frame=M,
            n_views=V,
            optimize_rig=self.optimize_rig and not motion_only,
            **self.ba_cfg_kwargs,
        )

        idx = np.arange(Nb)
        if fixed_motion:
            pose_mask = np.zeros(Nb, bool)
        else:
            pose_mask = (idx >= t0) & (idx < t1) & (idx < buf.n_frames)
        idv = np.arange(NbV) // V
        # disps update ONLY where a BA edge sources from the variable — the
        # reference materializes dense_disp variables from the edge list
        # (buffer.py:373-430); anchoring edgeless frames to disps_sens each
        # call would drift them
        has_edge = fill_ct > 0
        if motion_only:
            disp_mask = np.zeros(NbV, bool)
        elif limited_disp:
            disp_mask = has_edge & (idv >= t0) & (idv < t1) & (idv < buf.n_frames)
        else:
            disp_mask = has_edge & (idv < buf.n_frames)

        disp_damping = 0.2 * self.damping[:NbV].reshape(NbV, P) + 1e-7
        sens = buf.disps_sens[:NbV].reshape(NbV, P)
        sens_mask = (jnp.sum(sens, axis=1) > 0) & (not motion_only)
        rig, _ = self._rig_intr()
        intr = buf.intrinsics if buf.intrinsics.ndim == 2 else buf.intrinsics[None]

        cols = [jnp.asarray(exp_pad[:, c], jnp.int32) for c in range(5)]
        _pmark("ba_prep", t_bprep)
        t_solve = time.perf_counter()
        poses, rig_new, disps, intr_new = ba.ba_solve_mv(
            cfg,
            buf.poses[:Nb],
            rig,
            buf.disps[:NbV].reshape(NbV, P),
            intr,
            target,
            weight,
            *cols,
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
            buf.disps, disps.reshape(NbV, self.ht, self.wd)
        )
        if optimize_intrinsics:
            buf.intrinsics = intr_new if buf.intrinsics.ndim == 2 else intr_new[0]
        if cfg.optimize_rig:
            buf.rig = rig_new
        _pmark("ba_solve_enq", t_solve)
