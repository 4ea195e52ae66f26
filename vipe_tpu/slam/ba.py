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
    n_views: int = 1               # rig views V; disp vars are (frame, view)
    optimize_rig: bool = False     # rig rotation group (reference
    #                                buffer.py:501-506 + RigRotationOnlyRetractor)

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

    @property
    def kr(self) -> int:
        """Rig dof in the global tail: 6 per view (translation rows are
        zeroed at retraction, matching RigRotationOnlyRetractor)."""
        return 6 * self.n_views if self.optimize_rig else 0

    @property
    def kt(self) -> int:
        """Global tail size (intrinsics + rig)."""
        return self.kf + self.kr


def build_edge_slots(ii, jj=None, n_frames: int = 0,
                     max_edges_per_frame: int = 8):
    """Host-side: group edges by source variable into fixed-width slots.

    ``ii`` is the source disp-variable index per edge (frame index for V=1).
    Returns (slot_edge (N, M) int32 — index into the edge list, E for empty;
    run whenever topology changes, NOT per BA iteration).  ``jj`` is unused
    (kept for call-site symmetry).
    """
    del jj
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


def _edge_residuals_and_jacobians(cfg: BAConfig, poses, rig, disps, intrinsics,
                                  target, pi, qi, di, pj, qj):
    """Per-edge residuals r (E,P,2), valid (E,P), and Jacobians.

    Full rig chain (reference geom.iproj_i_proj_j_disp, geom.py:187-298):
      proj[rig_qj⁻¹ · T_pj · T_pi⁻¹ · rig_qi · iproj(disp_di, intr_qi), intr_qj]

    ``rig`` (V,7) and ``intrinsics`` (V, D) are per-view; ``disps`` is the
    flattened (N·V, P) disparity table indexed by ``di``.

    Returns (r, valid, Ji, Jj, Jz, Jt) with Ji/Jj: (E,P,2,6), Jz: (E,P,2) and
    Jt: (E,P,2,kt) the combined global-tail Jacobian [intrinsics | rig] or
    None (rig parts scattered to the 6·qi / 6·qj tail columns).
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
    kr_edge = 12 if cfg.optimize_rig else 0  # [ξ_rig_qi, ξ_rig_qj] per edge
    ndof = 13 + kf + kr_edge
    V = cfg.n_views

    def coords_of(pose_i, pose_j, rig_i, rig_j, disp_i, intr_i, intr_j):
        intr_si = cam.scaled_intrinsics(
            cfg.camera_type, intr_i, 1.0 / cfg.intrinsics_factor
        )
        intr_sj = cam.scaled_intrinsics(
            cfg.camera_type, intr_j, 1.0 / cfg.intrinsics_factor
        )
        Gij = lie.se3_mul(
            lie.se3_inv(rig_j),
            lie.se3_mul(pose_j, lie.se3_mul(lie.se3_inv(pose_i), rig_i)),
        )
        pts = cam.iproj_disp(cfg.camera_type, intr_si, u, v, disp_i)
        q = Gij[3:7]
        t = Gij[:3]
        pjh = jnp.concatenate(
            [lie.quat_rotate(q, pts[..., :3]) + t * pts[..., 3:4], pts[..., 3:4]],
            axis=-1,
        )
        coords = cam.proj_points(cfg.camera_type, intr_sj, pjh)
        valid = pjh[..., 2] > _PROJ_MIN_DEPTH
        return coords, valid

    def per_edge(pose_i, pose_j, rig_i, rig_j, disp_i, intr_i, intr_j, tgt):
        def f(dx):
            xi_i = dx[0:6]
            xi_j = dx[6:12]
            dd = dx[12]
            df = dx[13: 13 + kf]
            p_i = lie.se3_retr(pose_i, xi_i)
            p_j = lie.se3_retr(pose_j, xi_j)
            r_i, r_j = rig_i, rig_j
            if cfg.optimize_rig:
                r_i = lie.se3_retr(rig_i, dx[13 + kf: 19 + kf])
                r_j = lie.se3_retr(rig_j, dx[19 + kf: 25 + kf])
            ii_full = _expand_intr_delta(cfg, intr_i, df)
            ij_full = _expand_intr_delta(cfg, intr_j, df)
            coords, _ = coords_of(p_i, p_j, r_i, r_j, disp_i + dd,
                                  ii_full, ij_full)
            return coords

        zero = jnp.zeros((ndof,), jnp.float32)
        coords0, valid = coords_of(
            pose_i, pose_j, rig_i, rig_j, disp_i, intr_i, intr_j
        )
        J = jax.jacfwd(f)(zero)  # (P, 2, ndof)
        r = coords0 - tgt
        return r, valid, J[..., 0:6], J[..., 6:12], J[..., 12], J[..., 13:]

    r, valid, Ji, Jj, Jz, Jrest = jax.vmap(per_edge)(
        poses[pi], poses[pj], rig[qi], rig[qj], disps[di],
        intrinsics[qi], intrinsics[qj], target,
    )

    kt = cfg.kt
    if kt == 0:
        return r, valid, Ji, Jj, Jz, None
    Jf = Jrest[..., :kf]
    if not cfg.optimize_rig:
        return r, valid, Ji, Jj, Jz, Jf
    # scatter per-edge rig Jacobians into the 6V tail by view index
    oh_i = jax.nn.one_hot(qi, V)  # (E, V)
    oh_j = jax.nn.one_hot(qj, V)
    Jri = Jrest[..., kf: kf + 6]
    Jrj = Jrest[..., kf + 6: kf + 12]
    Jr = (
        jnp.einsum("epcd,ev->epcvd", Jri, oh_i)
        + jnp.einsum("epcd,ev->epcvd", Jrj, oh_j)
    ).reshape(*Jri.shape[:-1], 6 * V)
    Jt = Jr if kf == 0 else jnp.concatenate([Jf, Jr], axis=-1)
    return r, valid, Ji, Jj, Jz, Jt


def assemble_system(
    cfg: BAConfig,
    poses,
    rig,
    disps,
    intrinsics,
    target,
    weight,
    pi,
    qi,
    di,
    pj,
    qj,
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

    Shapes: poses (N,7) per FRAME, rig (V,7), disps (ND,P) per (frame,view)
    variable (ND = N·V for rigs; ND = N when V = 1), intrinsics (V,D),
    target/weight (E,P,2) over expanded edges, pi/qi/di/pj/qj (E,),
    edge_valid (E,), slot_edge (ND,M) grouping edges by SOURCE DISP VARIABLE,
    pose_mask (N,), disp_mask (ND,), disp_damping/disp_sens (ND,P),
    sens_mask (ND,).

    Returns (Hd, bd, aux); Hd/bd is the dense (6N + kt) reduced system where
    kt = intrinsics dof + 6V rig dof.
    """
    ND, P = disps.shape
    N = poses.shape[0]
    E = pi.shape[0]
    M = cfg.max_edges_per_frame
    kt = cfg.kt

    r, valid, Ji, Jj, Jz, Jt = _edge_residuals_and_jacobians(
        cfg, poses, rig, disps, intrinsics, target, pi, qi, di, pj, qj
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

    if kt > 0:
        Bff_e = jnp.einsum("epci,epc,epcj->eij", Jt, w, Jt)
        Bfi_e = jnp.einsum("epci,epc,epcj->eij", Jt, w, Ji)  # (E,kt,6)
        Bfj_e = jnp.einsum("epci,epc,epcj->eij", Jt, w, Jj)
        vf_e = -jnp.einsum("epci,epc,epc->ei", Jt, w, r)
        Ef_blk = jnp.einsum("epci,epc,epc->eip", Jt, w, Jz)  # (E,kt,P)

    # --- disp diagonal (per disp VARIABLE di) ----------------------------
    seg = functools.partial(jax.ops.segment_sum, num_segments=ND)
    C = seg(C_edge, di) + disp_damping + cfg.disp_ep
    b_disp = seg(bz_edge, di)
    # disp_sens anchor (callers pass sens_mask = 0 in motion-only mode)
    sensw = cfg.alpha * sens_mask[:, None]
    C = C + sensw
    b_disp = b_disp - sensw * (disps - disp_sens)
    Cinv = jnp.where(disp_mask[:, None], 1.0 / C, 0.0)  # fixed disp → dx = 0

    # --- per-disp-variable Schur grouping --------------------------------
    # rows: [pose of the disp's frame (6)] + M×[pose pj (6)] + [tail (kt)]
    Ei_sum = seg(Ei_blk, di)  # (ND,6,P)
    slot_valid = slot_edge < E  # (ND,M)
    Ej_pad = jnp.concatenate([Ej_blk, jnp.zeros((1, 6, P), Ej_blk.dtype)], 0)
    G_j = Ej_pad[jnp.minimum(slot_edge, E)]  # (ND,M,6,P)
    own_pose = jnp.arange(ND, dtype=jnp.int32) // cfg.n_views
    fvar = jnp.concatenate(
        [
            own_pose[:, None],
            jnp.where(slot_valid, pj[jnp.minimum(slot_edge, E - 1)], N).astype(jnp.int32),
        ],
        axis=1,
    )  # (ND, 1+M) — pose-variable id per 6-row block, N = trash
    G_rows = jnp.concatenate([Ei_sum[:, None], G_j], axis=1)  # (ND,1+M,6,P)
    R6 = (1 + M) * 6
    G = G_rows.reshape(ND, R6, P)
    if kt > 0:
        Gf = seg(Ef_blk, di)  # (ND,kt,P)
        G = jnp.concatenate([G, Gf], axis=1)  # (ND, R6+kt, P)

    GC = G * Cinv[:, None, :]
    S = jnp.einsum("krp,ksp->krs", GC, G)  # (ND, R, R) — the E C^-1 E^T blocks
    b_schur_rows = jnp.einsum("krp,kp->kr", GC, b_disp)  # (ND, R)

    # --- assemble dense pose Hessian (N+1 trash frame) ------------------
    NV = N + 1
    seg2 = functools.partial(jax.ops.segment_sum, num_segments=NV * NV)
    iiv = jnp.where(edge_valid, pi, N).astype(jnp.int32)
    jjv = jnp.where(edge_valid, pj, N).astype(jnp.int32)

    pair_idx = jnp.concatenate(
        [iiv * NV + iiv, iiv * NV + jjv, jjv * NV + iiv, jjv * NV + jjv]
    )
    pair_blk = jnp.concatenate(
        [Bii, Bij, jnp.swapaxes(Bij, -1, -2), Bjj]
    ).reshape(4 * E, 36)
    H_pose = seg2(pair_blk, pair_idx).reshape(NV, NV, 6, 6)

    # Schur correction scatter
    Spp = S[:, :R6, :R6].reshape(ND, 1 + M, 6, 1 + M, 6).transpose(0, 1, 3, 2, 4)
    corr_idx = (fvar[:, :, None] * NV + fvar[:, None, :]).reshape(-1)
    H_pose = H_pose - seg2(Spp.reshape(-1, 36), corr_idx).reshape(NV, NV, 6, 6)

    segv = functools.partial(jax.ops.segment_sum, num_segments=NV)
    b_pose = segv(jnp.concatenate([vi, vj]), jnp.concatenate([iiv, jjv]))
    b_pose = b_pose - segv(
        b_schur_rows[:, :R6].reshape(ND * (1 + M), 6), fvar.reshape(-1)
    )

    if kt > 0:
        H_ff = jnp.sum(Bff_e * edge_valid[:, None, None], axis=0) - jnp.sum(
            S[:, R6:, R6:], axis=0
        )
        # pose-tail coupling: direct part scattered by edge, Schur by fvar
        Hpf_direct = segv(
            jnp.concatenate([jnp.swapaxes(Bfi_e, -1, -2), jnp.swapaxes(Bfj_e, -1, -2)]),
            jnp.concatenate([iiv, jjv]),
        )  # (NV, 6, kt)
        Spf = S[:, :R6, R6:].reshape(ND * (1 + M), 6, kt)
        H_pf = Hpf_direct - segv(Spf, fvar.reshape(-1))
        b_f = jnp.sum(vf_e * edge_valid[:, None], axis=0) - jnp.sum(
            b_schur_rows[:, R6:], axis=0
        )
        # damping: intrinsics 1e-6/1e-6 (buffer.py:499); rig 1e-4/1e-4 (:502)
        tail_damp = jnp.concatenate([
            jnp.full((cfg.kf,), 1e-6), jnp.full((cfg.kr,), 1e-4)
        ])
        H_ff = H_ff + tail_damp * jnp.diag(jnp.diag(H_ff)) \
            + jnp.diag(tail_damp)
        # fix rig view 0 (reference buffer.py:506 set_fixed("rig", [0]))
        if cfg.kr > 0:
            tmask = jnp.concatenate([
                jnp.ones(cfg.kf), jnp.zeros(6), jnp.ones(cfg.kr - 6)
            ])
            H_ff = H_ff * tmask[:, None] * tmask[None, :] \
                + jnp.diag(1.0 - tmask)
            H_pf = H_pf * tmask[None, None, :]
            b_f = b_f * tmask

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

    D = 6 * N + kt
    Hd = jnp.zeros((D, D), jnp.float32)
    Hd = Hd.at[: 6 * N, : 6 * N].set(
        Hp.transpose(0, 2, 1, 3).reshape(6 * N, 6 * N)
    )
    bd = jnp.zeros((D,), jnp.float32)
    bd = bd.at[: 6 * N].set((b_pose[:N] * pm[:, None]).reshape(-1))
    if kt > 0:
        Hpf_m = H_pf[:N] * pm[:, None, None]
        Hd = Hd.at[: 6 * N, 6 * N :].set(Hpf_m.reshape(6 * N, kt))
        Hd = Hd.at[6 * N :, : 6 * N].set(Hpf_m.reshape(6 * N, kt).T)
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
    rig,
    disps,
    intrinsics,
    target,
    weight,
    pi,
    qi,
    di,
    pj,
    qj,
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
    ND, P = disps.shape
    N = poses.shape[0]
    M = cfg.max_edges_per_frame
    R6 = (1 + M) * 6
    kf = cfg.kf
    kt = cfg.kt

    Hd, bd, aux = assemble_system(
        cfg, poses, rig, disps, intrinsics, target, weight,
        pi, qi, di, pj, qj, edge_valid,
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
    dx_rows = dx_pose_pad[fvar].reshape(ND, R6)  # (ND, (1+M)*6)
    if kt > 0:
        dx_rows = jnp.concatenate(
            [dx_rows, jnp.broadcast_to(dx_f, (ND, kt))], axis=1
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
        # shared-focal broadcast across views + 0.01 distortion lr
        # (IntrinsicsRetractor, retractor.py:51-62)
        intr_new = intr_new.at[:, 0].add(dx_f[0]).at[:, 1].add(dx_f[0])
        if kf > 1:
            intr_new = intr_new.at[:, 4:].add(dx_f[1:kf] * 0.01)

    rig_new = rig
    if cfg.kr > 0:
        dx_rig = dx_f[kf:].reshape(cfg.n_views, 6)
        # rotation-only retraction (RigRotationOnlyRetractor, retractor.py:32-36)
        dx_rig = dx_rig.at[:, :3].set(0.0)
        rig_new = lie.se3_retr(rig, dx_rig)

    stats = {
        "residual": jnp.sum(w * r * r),
        "dx_pose_norm": jnp.linalg.norm(dx_pose),
    }
    return poses_new, rig_new, disps_new, intr_new, stats


@functools.partial(jax.jit, static_argnums=0)
def ba_solve_mv(
    cfg: BAConfig,
    poses,
    rig,
    disps,
    intrinsics,
    target,
    weight,
    pi,
    qi,
    di,
    pj,
    qj,
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
    """Run ``n_iters`` Gauss-Newton iterations over the full multi-view rig
    problem (reference: one ``Solver.run_inplace`` per iteration over the
    pose/dense_disp/intrinsics/rig groups, buffer.py:373-525).

    ``n_iters``/``pose_damping``/``pose_ep`` are dynamic (traced) so frontend
    and backend calls share one compiled program per (shape, cfg)."""

    def body(_, carry):
        poses, rig_, disps, intr = carry
        poses, rig_, disps, intr, _ = ba_iteration(
            cfg, poses, rig_, disps, intr, target, weight,
            pi, qi, di, pj, qj, edge_valid,
            slot_edge, pose_mask, disp_mask, disp_damping, disp_sens, sens_mask,
            pose_damping, pose_ep,
        )
        return poses, rig_, disps, intr

    poses, rig, disps, intrinsics = jax.lax.fori_loop(
        0, n_iters, body, (poses, rig, disps, intrinsics)
    )
    # final clamp as in buffer.py:525 (applied after the iteration loop there)
    disps = jnp.maximum(disps, 0.001)
    return poses, rig, disps, intrinsics


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
    """Single-view (V = 1) entry: identity rig, one intrinsics row."""
    rig = jnp.broadcast_to(lie.se3_identity(), (1, 7)).astype(jnp.float32)
    zeros = jnp.zeros_like(ii)
    poses, _, disps, intr = ba_solve_mv(
        cfg, poses, rig, disps, intrinsics[None], target, weight,
        ii, zeros, ii, jj, zeros, edge_valid, slot_edge,
        pose_mask, disp_mask, disp_damping, disp_sens, sens_mask,
        n_iters, pose_damping, pose_ep,
    )
    return poses, disps, intr[0]
