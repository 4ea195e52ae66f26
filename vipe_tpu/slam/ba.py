"""Dense bundle adjustment, fully on-device (jit/XLA, no host round-trips).

TPU-native replacement for the reference's generic ``Solver`` stack
(``/root/reference/vipe/slam/ba/solver.py`` + ``terms.py`` + the sparse block
matrices in ``maths/matrix.py``).  The reference assembles COO block-sparse
JᵀWJ on GPU, then ships the Schur-reduced system to **scipy spsolve on the
CPU every Gauss–Newton iteration** (solver.py:33-44).  Here the whole
iteration — residuals, Jacobians, Schur complement, Cholesky solve,
retraction — is one jitted program:

  * Jacobians come from one vmapped ``jax.jacfwd`` over a compact tangent
    vector ``[ξ_i(6), ξ_j(6), δd(1), δf(kf)]`` per edge.  The per-pixel
    disparity derivative uses the "ones-tangent" trick: the residual at pixel
    p depends only on d_p, so a single broadcast tangent recovers the full
    diagonal.  No hand-written Jacobians (reference: terms.py:178-243,
    geom.py:241-298) and no custom VJPs.
  * The disp block C is diagonal (one scalar per pixel) → O(1) inverse, as in
    the reference (matrix.py:322).
  * The pose↔disp Schur correction is grouped **per source frame** so it
    becomes a batched (R·6+kf, P) @ (P, R·6+kf) matmul — MXU-shaped — instead
    of the reference's per-edge-pair scatter products.
  * The reduced system over all poses (+ shared intrinsics) is solved with a
    dense on-device Cholesky (≤ 6·N + kf unknowns, N ≤ 1024 keyframes).

All shapes are static; edge lists are padded and masked.  Graph topology
(which is host-side Python in both designs) enters only through integer index
arrays, so topology changes don't trigger recompiles.

Damping / weighting semantics preserved from the reference
(buffer.bundle_adjustment, buffer.py:373-525):
  * pose:  H_pp += pose_damping · diag(H_pp) + pose_ep · I
  * disp:  C += damping_vec + disp_ep   (caller passes 0.2·eta + 1e-7, ep=1e-7)
  * intrinsics: H_ff += 1e-6 · diag + 1e-6 · I
  * disp_sens regularizer: alpha · |d − d_sens|² on frames with any sens
  * retraction: pose ← exp(dx)·pose; disp += dx (dx>10 rejected); shared
    focal += df, distortion += dk·0.01 (retractor.py:27-62)
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import cameras as cam
from ..ops import lie
from ..ops.geom import MIN_DEPTH as _GEOM_MIN_DEPTH

_PROJ_MIN_DEPTH = 0.1  # cameras.MIN_DEPTH — valid-mask threshold used by terms


@dataclass(frozen=True)
class BAConfig:
    """Static BA configuration (hashable: goes into the jit cache key)."""

    camera_type: cam.CameraType = cam.CameraType.PINHOLE
    ht: int = 48
    wd: int = 64
    intrinsics_factor: float = 8.0
    optimize_intrinsics: bool = False
    disp_ep: float = 1e-7
    alpha: float = 0.001  # disp_sens regularization weight
    max_edges_per_frame: int = 24  # slot bucket M

    # NOTE: iteration count, pose damping/ep and motion-only are DYNAMIC
    # arguments of ba_solve/ba_iteration (they vary between frontend and
    # backend calls; keeping them out of the static config avoids a jit
    # recompile per hyperparameter combination).

    @property
    def kf(self) -> int:
        """Intrinsics dof: shared focal + distortion params."""
        if not self.optimize_intrinsics:
            return 0
        return 1 + self.camera_type.n_distortion


def build_edge_slots(ii, jj, n_frames: int, max_edges_per_frame: int):
    """Host-side: group edges by source frame into fixed-width slots.

    Returns (slot_edge (N, M) int32 — index into the edge list, E for empty;
    run whenever topology changes, NOT per BA iteration).
    """
    ii = np.asarray(ii)
    E = len(ii)
    M = max_edges_per_frame
    slot_edge = np.full((n_frames, M), E, dtype=np.int32)
    fill = np.zeros(n_frames, dtype=np.int64)
    for e, i in enumerate(ii):
        if i < 0 or i >= n_frames:
            continue
        if fill[i] >= M:
            raise ValueError(
                f"frame {i} has more than {M} outgoing edges; raise max_edges_per_frame"
            )
        slot_edge[i, fill[i]] = e
        fill[i] += 1
    return slot_edge


def _expand_intr_delta(cfg: BAConfig, intr, df):
    """Apply the intrinsics tangent [dfocal, ddist...] to a full-res vector."""
    if cfg.kf == 0:
        return intr
    delta_pix = jnp.zeros(4, intr.dtype).at[0].add(df[0]).at[1].add(df[0])
    out = intr.at[:4].add(delta_pix)
    if cfg.kf > 1:
        out = out.at[4:].add(df[1:])
    return out


def _edge_residuals_and_jacobians(cfg: BAConfig, poses, disps, intrinsics, target, ii, jj):
    """Per-edge residuals r (E,P,2), valid (E,P), and Jacobians.

    Returns (r, valid, Ji, Jj, Jz, Jf) with
      Ji/Jj: (E, P, 2, 6), Jz: (E, P, 2), Jf: (E, P, 2, kf) or None.
    """
    P = cfg.ht * cfg.wd
    u, v = jnp.meshgrid(
        jnp.arange(cfg.wd, dtype=jnp.float32),
        jnp.arange(cfg.ht, dtype=jnp.float32),
        indexing="xy",
    )
    u = u.reshape(P)
    v = v.reshape(P)
    kf = cfg.kf
    ndof = 13 + kf

    def coords_of(pose_i, pose_j, disp_i, intr_full):
        intr_s = cam.scaled_intrinsics(
            cfg.camera_type, intr_full, 1.0 / cfg.intrinsics_factor
        )
        Gij = lie.se3_mul(pose_j, lie.se3_inv(pose_i))
        pts = cam.iproj_disp(cfg.camera_type, intr_s, u, v, disp_i)
        q = Gij[3:7]
        t = Gij[:3]
        pj = jnp.concatenate(
            [lie.quat_rotate(q, pts[..., :3]) + t * pts[..., 3:4], pts[..., 3:4]],
            axis=-1,
        )
        coords = cam.proj_points(cfg.camera_type, intr_s, pj)
        valid = pj[..., 2] > _PROJ_MIN_DEPTH
        return coords, valid

    def per_edge(pose_i, pose_j, disp_i, tgt):
        def f(dx):
            xi_i = dx[0:6]
            xi_j = dx[6:12]
            dd = dx[12]
            df = dx[13:]
            p_i = lie.se3_retr(pose_i, xi_i)
            p_j = lie.se3_retr(pose_j, xi_j)
            intr_full = _expand_intr_delta(cfg, intrinsics, df)
            coords, _ = coords_of(p_i, p_j, disp_i + dd, intr_full)
            return coords

        zero = jnp.zeros((ndof,), jnp.float32)
        coords0, valid = coords_of(pose_i, pose_j, disp_i, intrinsics)
        J = jax.jacfwd(f)(zero)  # (P, 2, ndof)
        r = coords0 - tgt
        Ji = J[..., 0:6]
        Jj = J[..., 6:12]
        Jz = J[..., 12]
        Jf = J[..., 13:] if kf > 0 else None
        return r, valid, Ji, Jj, Jz, Jf

    return jax.vmap(per_edge)(poses[ii], poses[jj], disps[ii], target)


def assemble_system(
    cfg: BAConfig,
    poses,
    disps,
    intrinsics,
    target,
    weight,
    ii,
    jj,
    edge_valid,
    slot_edge,
    pose_mask,
    disp_mask,
    disp_damping,
    disp_sens,
    sens_mask,
    pose_damping,
    pose_ep,
):
    """Assemble the Schur-reduced dense system for one Gauss-Newton iteration.

    Shapes: poses (N,7), disps (N,P), intrinsics (D,), target/weight (E,P,2),
    ii/jj (E,), edge_valid (E,), slot_edge (N,M), pose_mask/disp_mask (N,),
    disp_damping (N,P) (pre-scaled damping vector), disp_sens (N,P),
    sens_mask (N,) — frames with a valid metric-depth prior.

    Returns (Hd, bd, aux) where Hd/bd is the (6N+kf) dense reduced system and
    aux carries what back-substitution and diagnostics need.
    """
    N, P = disps.shape
    E = ii.shape[0]
    M = cfg.max_edges_per_frame
    kf = cfg.kf

    r, valid, Ji, Jj, Jz, Jf = _edge_residuals_and_jacobians(
        cfg, poses, disps, intrinsics, target, ii, jj
    )

    w = weight * valid[..., None] * edge_valid[:, None, None]  # (E,P,2)

    # --- per-edge blocks -------------------------------------------------
    Bii = jnp.einsum("epci,epc,epcj->eij", Ji, w, Ji)
    Bij = jnp.einsum("epci,epc,epcj->eij", Ji, w, Jj)
    Bjj = jnp.einsum("epci,epc,epcj->eij", Jj, w, Jj)
    vi = -jnp.einsum("epci,epc,epc->ei", Ji, w, r)
    vj = -jnp.einsum("epci,epc,epc->ei", Jj, w, r)

    Ei_blk = jnp.einsum("epci,epc,epc->eip", Ji, w, Jz)  # (E,6,P)
    Ej_blk = jnp.einsum("epci,epc,epc->eip", Jj, w, Jz)
    C_edge = jnp.einsum("epc,epc,epc->ep", Jz, w, Jz)
    bz_edge = -jnp.einsum("epc,epc,epc->ep", Jz, w, r)

    if kf > 0:
        Bff_e = jnp.einsum("epci,epc,epcj->eij", Jf, w, Jf)
        Bfi_e = jnp.einsum("epci,epc,epcj->eij", Jf, w, Ji)  # (E,kf,6)
        Bfj_e = jnp.einsum("epci,epc,epcj->eij", Jf, w, Jj)
        vf_e = -jnp.einsum("epci,epc,epc->ei", Jf, w, r)
        Ef_blk = jnp.einsum("epci,epc,epc->eip", Jf, w, Jz)  # (E,kf,P)

    # --- disp diagonal ---------------------------------------------------
    seg = functools.partial(jax.ops.segment_sum, num_segments=N)
    C = seg(C_edge, ii) + disp_damping + cfg.disp_ep
    b_disp = seg(bz_edge, ii)
    # disp_sens anchor (callers pass sens_mask = 0 in motion-only mode)
    sensw = cfg.alpha * sens_mask[:, None]
    C = C + sensw
    b_disp = b_disp - sensw * (disps - disp_sens)
    Cinv = jnp.where(disp_mask[:, None], 1.0 / C, 0.0)  # fixed disp → dx = 0

    # --- per-source-frame Schur grouping --------------------------------
    # rows: [pose ii (6)] + M×[pose jj (6)] + [intrinsics (kf)]
    Ei_sum = seg(Ei_blk, ii)  # (N,6,P)
    slot_valid = slot_edge < E  # (N,M)
    Ej_pad = jnp.concatenate([Ej_blk, jnp.zeros((1, 6, P), Ej_blk.dtype)], 0)
    G_j = Ej_pad[jnp.minimum(slot_edge, E)]  # (N,M,6,P)
    fvar = jnp.concatenate(
        [
            jnp.arange(N, dtype=jnp.int32)[:, None],
            jnp.where(slot_valid, jj[jnp.minimum(slot_edge, E - 1)], N).astype(jnp.int32),
        ],
        axis=1,
    )  # (N, 1+M) — frame-variable id per 6-row block, N = trash
    G_rows = jnp.concatenate([Ei_sum[:, None], G_j], axis=1)  # (N,1+M,6,P)
    R6 = (1 + M) * 6
    G = G_rows.reshape(N, R6, P)
    if kf > 0:
        Ef_pad = jnp.concatenate([Ef_blk, jnp.zeros((1, kf, P), Ef_blk.dtype)], 0)
        Gf = seg(Ef_blk, ii)  # (N,kf,P)
        G = jnp.concatenate([G, Gf], axis=1)  # (N, R6+kf, P)

    GC = G * Cinv[:, None, :]
    S = jnp.einsum("krp,ksp->krs", GC, G)  # (N, R, R) — the E C^-1 E^T blocks
    b_schur_rows = jnp.einsum("krp,kp->kr", GC, b_disp)  # (N, R)

    # --- assemble dense pose Hessian (N+1 trash frame) ------------------
    NV = N + 1
    seg2 = functools.partial(jax.ops.segment_sum, num_segments=NV * NV)
    iiv = jnp.where(edge_valid, ii, N).astype(jnp.int32)
    jjv = jnp.where(edge_valid, jj, N).astype(jnp.int32)

    pair_idx = jnp.concatenate(
        [iiv * NV + iiv, iiv * NV + jjv, jjv * NV + iiv, jjv * NV + jjv]
    )
    pair_blk = jnp.concatenate(
        [Bii, Bij, jnp.swapaxes(Bij, -1, -2), Bjj]
    ).reshape(4 * E, 36)
    H_pose = seg2(pair_blk, pair_idx).reshape(NV, NV, 6, 6)

    # Schur correction scatter
    Spp = S[:, :R6, :R6].reshape(N, 1 + M, 6, 1 + M, 6).transpose(0, 1, 3, 2, 4)
    corr_idx = (fvar[:, :, None] * NV + fvar[:, None, :]).reshape(-1)
    H_pose = H_pose - seg2(Spp.reshape(-1, 36), corr_idx).reshape(NV, NV, 6, 6)

    segv = functools.partial(jax.ops.segment_sum, num_segments=NV)
    b_pose = segv(jnp.concatenate([vi, vj]), jnp.concatenate([iiv, jjv]))
    b_pose = b_pose - segv(
        b_schur_rows[:, :R6].reshape(N * (1 + M), 6), fvar.reshape(-1)
    )

    if kf > 0:
        H_ff = jnp.sum(Bff_e * edge_valid[:, None, None], axis=0) - jnp.sum(
            S[:, R6:, R6:], axis=0
        )
        # pose-f coupling: direct part scattered by edge, Schur part by fvar
        Hpf_direct = segv(
            jnp.concatenate([jnp.swapaxes(Bfi_e, -1, -2), jnp.swapaxes(Bfj_e, -1, -2)]),
            jnp.concatenate([iiv, jjv]),
        )  # (NV, 6, kf)
        Spf = S[:, :R6, R6:].reshape(N * (1 + M), 6, kf)
        H_pf = Hpf_direct - segv(Spf, fvar.reshape(-1))
        b_f = jnp.sum(vf_e * edge_valid[:, None], axis=0) - jnp.sum(
            b_schur_rows[:, R6:], axis=0
        )
        H_ff = H_ff + 1e-6 * jnp.diag(jnp.diag(H_ff)) + 1e-6 * jnp.eye(kf)

    # --- damping + fixing, dense solve -----------------------------------
    Hp = H_pose[:N, :N]  # (N,N,6,6)
    diag_blocks = jnp.einsum("nnij->nij", Hp)  # view of diagonal (N,6,6)
    damped = (
        diag_blocks
        + pose_damping * diag_blocks * jnp.eye(6)
        + pose_ep * jnp.eye(6)
    )
    Hp = Hp.at[jnp.arange(N), jnp.arange(N)].set(damped)

    pm = pose_mask.astype(jnp.float32)
    Hp = Hp * pm[:, None, None, None] * pm[None, :, None, None]
    # unit diagonal on fixed/trash rows keeps the Cholesky SPD
    fixed_eye = jnp.eye(6) * (1.0 - pm)[:, None, None]
    Hp = Hp.at[jnp.arange(N), jnp.arange(N)].add(fixed_eye)

    D = 6 * N + kf
    Hd = jnp.zeros((D, D), jnp.float32)
    Hd = Hd.at[: 6 * N, : 6 * N].set(
        Hp.transpose(0, 2, 1, 3).reshape(6 * N, 6 * N)
    )
    bd = jnp.zeros((D,), jnp.float32)
    bd = bd.at[: 6 * N].set((b_pose[:N] * pm[:, None]).reshape(-1))
    if kf > 0:
        Hpf_m = H_pf[:N] * pm[:, None, None]
        Hd = Hd.at[: 6 * N, 6 * N :].set(Hpf_m.reshape(6 * N, kf))
        Hd = Hd.at[6 * N :, : 6 * N].set(Hpf_m.reshape(6 * N, kf).T)
        Hd = Hd.at[6 * N :, 6 * N :].set(H_ff)
        bd = bd.at[6 * N :].set(b_f)

    aux = dict(
        Cinv=Cinv, b_disp=b_disp, G=G, fvar=fvar, pm=pm,
        w=w, r=r,
    )
    return Hd, bd, aux


def ba_iteration(
    cfg: BAConfig,
    poses,
    disps,
    intrinsics,
    target,
    weight,
    ii,
    jj,
    edge_valid,
    slot_edge,
    pose_mask,
    disp_mask,
    disp_damping,
    disp_sens,
    sens_mask,
    pose_damping=1e-3,
    pose_ep=0.1,
):
    """One Gauss-Newton iteration: assemble, solve, back-substitute, retract."""
    N, P = disps.shape
    M = cfg.max_edges_per_frame
    R6 = (1 + M) * 6
    kf = cfg.kf

    Hd, bd, aux = assemble_system(
        cfg, poses, disps, intrinsics, target, weight, ii, jj, edge_valid,
        slot_edge, pose_mask, disp_mask, disp_damping, disp_sens, sens_mask,
        pose_damping, pose_ep,
    )
    Cinv, b_disp, G, fvar, pm = (
        aux["Cinv"], aux["b_disp"], aux["G"], aux["fvar"], aux["pm"]
    )
    w, r = aux["w"], aux["r"]
    D = Hd.shape[0]

    # symmetrize: einsum/scatter accumulation order leaves ~1e-5 relative
    # asymmetry in f32, which jax's blocked Cholesky turns into NaNs
    Hd = 0.5 * (Hd + Hd.T) + 1e-8 * jnp.eye(D)
    cho = jax.scipy.linalg.cho_factor(Hd)
    dx = jax.scipy.linalg.cho_solve(cho, bd)

    dx_pose = dx[: 6 * N].reshape(N, 6) * pm[:, None]
    dx_f = dx[6 * N :]

    # --- back-substitute disparities -------------------------------------
    dx_pose_pad = jnp.concatenate([dx_pose, jnp.zeros((1, 6))], 0)
    dx_rows = dx_pose_pad[fvar].reshape(N, R6)  # (N, (1+M)*6)
    if kf > 0:
        dx_rows = jnp.concatenate(
            [dx_rows, jnp.broadcast_to(dx_f, (N, kf))], axis=1
        )
    dx_disp = Cinv * (b_disp - jnp.einsum("krp,kr->kp", G, dx_rows))

    # --- retract ----------------------------------------------------------
    poses_new = jnp.where(
        pose_mask[:, None], lie.se3_retr(poses, dx_pose), poses
    )
    dx_disp = jnp.where(dx_disp > 10.0, 0.0, dx_disp)  # DenseDispRetractor
    disps_new = disps + jnp.where(disp_mask[:, None], dx_disp, 0.0)

    intr_new = intrinsics
    if kf > 0:
        intr_new = intr_new.at[0].add(dx_f[0]).at[1].add(dx_f[0])
        if kf > 1:
            intr_new = intr_new.at[4:].add(dx_f[1:] * 0.01)

    stats = {
        "residual": jnp.sum(w * r * r),
        "dx_pose_norm": jnp.linalg.norm(dx_pose),
    }
    return poses_new, disps_new, intr_new, stats


@functools.partial(jax.jit, static_argnums=0)
def ba_solve(
    cfg: BAConfig,
    poses,
    disps,
    intrinsics,
    target,
    weight,
    ii,
    jj,
    edge_valid,
    slot_edge,
    pose_mask,
    disp_mask,
    disp_damping,
    disp_sens,
    sens_mask,
    n_iters,
    pose_damping,
    pose_ep,
):
    """Run ``n_iters`` Gauss-Newton iterations (reference: one
    ``Solver.run_inplace`` call per iteration, buffer.py:513-521).

    ``n_iters``/``pose_damping``/``pose_ep`` are dynamic (traced) so frontend
    and backend calls share one compiled program per (shape, cfg)."""

    def body(_, carry):
        poses, disps, intr = carry
        poses, disps, intr, _ = ba_iteration(
            cfg, poses, disps, intr, target, weight, ii, jj, edge_valid,
            slot_edge, pose_mask, disp_mask, disp_damping, disp_sens, sens_mask,
            pose_damping, pose_ep,
        )
        return poses, disps, intr

    poses, disps, intrinsics = jax.lax.fori_loop(
        0, n_iters, body, (poses, disps, intrinsics)
    )
    # final clamp as in buffer.py:525 (applied after the iteration loop there)
    disps = jnp.maximum(disps, 0.001)
    return poses, disps, intrinsics
