"""Bundle-adjustment tests on synthetic problems (SURVEY.md §4 item 2).

Oracle strategy:
  * generate GT poses/disps, render reprojection targets with the forward
    model, perturb, assert Gauss-Newton convergence back to GT;
  * verify one Schur-marginalized iteration EXACTLY matches a brute-force
    dense solve of the full (pose ⊕ disp) normal equations built via autodiff.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vipe_tpu.ops import cameras as cam
from vipe_tpu.ops import geom, lie
from vipe_tpu.slam import ba


HT, WD = 8, 12
P = HT * WD


def make_problem(rng, n=4, translation=0.15):
    """GT scene: camera track + smooth disparities; returns arrays + targets."""
    intr_grid = jnp.asarray([WD * 1.5, WD * 1.5, WD / 2.0, HT / 2.0])
    intr_full = intr_grid * 8.0  # BA divides by intrinsics_factor=8

    steps = []
    for k in range(n):
        xi = np.concatenate([
            [translation * k, 0.02 * rng.normal(), 0.02 * rng.normal()],
            0.01 * rng.normal(size=3),
        ])
        steps.append(lie.se3_exp(jnp.asarray(xi, jnp.float32)))
    poses_gt = jnp.stack(steps)

    u, v = geom.pixel_grid(HT, WD)
    base = 0.6 + 0.15 * jnp.sin(u / 3.0) * jnp.cos(v / 2.0)
    disps_gt = jnp.stack([base + 0.02 * k for k in range(n)])

    ii = jnp.asarray([i for i in range(n - 1)] + [i for i in range(n - 2)], jnp.int32)
    jj = jnp.asarray([i + 1 for i in range(n - 1)] + [i + 2 for i in range(n - 2)], jnp.int32)
    # symmetrize (DROID graphs contain both directions)
    ii, jj = jnp.concatenate([ii, jj]), jnp.concatenate([jj, ii])

    target, valid = geom.reproject(poses_gt, disps_gt, intr_grid, cam.CameraType.PINHOLE, ii, jj)
    target = target.reshape(len(ii), P, 2)
    weight = jnp.ones((len(ii), P, 2)) * valid.reshape(len(ii), P, 1)

    return dict(
        poses_gt=poses_gt,
        disps_gt=disps_gt.reshape(n, P),
        intr_full=intr_full,
        intr_grid=intr_grid,
        ii=ii,
        jj=jj,
        target=target,
        weight=weight,
        n=n,
    )


def run_ba(prob, poses0, disps0, intr0, cfg, fixed_poses=(0, 1), motion_only=False,
           n_iters=8, pose_damping=1e-5, pose_ep=1e-4):
    n = prob["n"]
    E = len(prob["ii"])
    slot_edge = jnp.asarray(
        ba.build_edge_slots(prob["ii"], prob["jj"], n, cfg.max_edges_per_frame)
    )
    pose_mask = jnp.asarray([i not in fixed_poses for i in range(n)])
    disp_mask = jnp.full((n,), not motion_only)
    disp_damping = jnp.full((n, P), 1e-4)
    disp_sens = prob["disps_gt"]
    sens_mask = jnp.zeros((n,))
    return ba.ba_solve(
        cfg, poses0, disps0, intr0, prob["target"], prob["weight"],
        prob["ii"], prob["jj"], jnp.ones((E,), bool), slot_edge,
        pose_mask, disp_mask, disp_damping, disp_sens, sens_mask,
        jnp.int32(n_iters), jnp.float32(pose_damping), jnp.float32(pose_ep),
    )


def pose_err(a, b):
    d = lie.se3_mul(a, lie.se3_inv(b))
    return float(jnp.max(jnp.linalg.norm(lie.se3_log(d), axis=-1)))


class TestBAConvergence:
    def test_motion_only_recovers_poses(self, rng):
        prob = make_problem(rng)
        cfg = ba.BAConfig(ht=HT, wd=WD, max_edges_per_frame=8)
        xi_noise = jnp.asarray(rng.normal(size=(prob["n"], 6)) * 0.02, jnp.float32)
        xi_noise = xi_noise.at[0].set(0.0).at[1].set(0.0)
        poses0 = lie.se3_retr(prob["poses_gt"], xi_noise)
        poses1, _, _ = run_ba(prob, poses0, prob["disps_gt"], prob["intr_full"], cfg,
                              motion_only=True, pose_ep=1e-3)
        assert pose_err(poses1, prob["poses_gt"]) < 1e-3
        assert pose_err(poses1, prob["poses_gt"]) < 0.05 * pose_err(poses0, prob["poses_gt"])

    def test_joint_pose_disp(self, rng):
        prob = make_problem(rng)
        cfg = ba.BAConfig(ht=HT, wd=WD, max_edges_per_frame=8)
        xi_noise = jnp.asarray(rng.normal(size=(prob["n"], 6)) * 0.01, jnp.float32)
        xi_noise = xi_noise.at[0].set(0.0).at[1].set(0.0)
        poses0 = lie.se3_retr(prob["poses_gt"], xi_noise)
        disps0 = prob["disps_gt"] * jnp.asarray(
            1.0 + 0.05 * rng.normal(size=prob["disps_gt"].shape), jnp.float32
        )
        poses1, disps1, _ = run_ba(prob, poses0, disps0, prob["intr_full"], cfg,
                                   n_iters=10)
        assert pose_err(poses1, prob["poses_gt"]) < 5e-3
        # disparity error should shrink substantially (borders can lack coverage)
        err0 = float(jnp.median(jnp.abs(disps0 - prob["disps_gt"])))
        err1 = float(jnp.median(jnp.abs(disps1 - prob["disps_gt"])))
        assert err1 < 0.2 * err0

    def test_intrinsics_recovery(self, rng):
        prob = make_problem(rng, n=5, translation=0.2)
        cfg = ba.BAConfig(ht=HT, wd=WD, optimize_intrinsics=True,
                          max_edges_per_frame=8)
        intr0 = prob["intr_full"].at[:2].multiply(1.15)  # 15% focal error
        poses1, disps1, intr1 = run_ba(
            prob, prob["poses_gt"], prob["disps_gt"], intr0, cfg, n_iters=12
        )
        err0 = abs(float(intr0[0] - prob["intr_full"][0]))
        err1 = abs(float(intr1[0] - prob["intr_full"][0]))
        assert err1 < 0.25 * err0

    def test_fixed_poses_stay_fixed(self, rng):
        prob = make_problem(rng)
        cfg = ba.BAConfig(ht=HT, wd=WD, max_edges_per_frame=8)
        poses1, _, _ = run_ba(prob, prob["poses_gt"], prob["disps_gt"],
                              prob["intr_full"], cfg)
        np.testing.assert_allclose(
            np.asarray(poses1[:2]), np.asarray(prob["poses_gt"][:2]), atol=0
        )


class TestSchurOracle:
    def test_assembly_matches_dense_normal_equations(self, rng):
        """The Schur-marginalized reduced system (Hd, bd) must equal the
        brute-force dense normal equations built from an autodiff Jacobian of
        the full (pose ⊕ disp) residual, with identical damping/fixing.

        (The post-solve states are NOT compared exactly: at condition number
        ~3e5 the f32 on-device Cholesky and a f64 numpy solve legitimately
        differ by a few percent of the step.)"""
        prob = make_problem(rng, n=3)
        n = prob["n"]
        cfg = ba.BAConfig(ht=HT, wd=WD, disp_ep=1e-7, max_edges_per_frame=8)
        xi_noise = jnp.asarray(rng.normal(size=(n, 6)) * 0.01, jnp.float32)
        poses0 = lie.se3_retr(prob["poses_gt"], xi_noise)
        disps0 = prob["disps_gt"] * 1.03

        E = len(prob["ii"])
        slot_edge = jnp.asarray(ba.build_edge_slots(prob["ii"], prob["jj"], n, 8))
        pose_mask = jnp.asarray([False] + [True] * (n - 1))
        disp_mask = jnp.ones((n,), bool)
        disp_damping = jnp.full((n, P), 1e-4)
        sens_mask = jnp.zeros((n,))
        pose_damping, pose_ep = 1e-3, 0.1

        rig1 = jnp.broadcast_to(lie.se3_identity(), (1, 7)).astype(jnp.float32)
        zeros_e = jnp.zeros_like(prob["ii"])
        Hd, bd, _ = jax.jit(ba.assemble_system, static_argnums=0)(
            cfg, poses0, rig1, disps0, prob["intr_full"][None],
            prob["target"], prob["weight"],
            prob["ii"], zeros_e, prob["ii"], prob["jj"], zeros_e,
            jnp.ones((E,), bool), slot_edge,
            pose_mask, disp_mask, disp_damping, prob["disps_gt"], sens_mask,
            jnp.float32(pose_damping), jnp.float32(pose_ep),
        )
        Hd = np.array(Hd)
        bd = np.array(bd)

        # ---- brute force oracle ----
        ii, jj = np.asarray(prob["ii"]), np.asarray(prob["jj"])
        u, v = geom.pixel_grid(HT, WD)
        u, v = u.reshape(P), v.reshape(P)
        intr_s = prob["intr_full"] / 8.0

        def full_residual(x):
            xi = x[: 6 * n].reshape(n, 6)
            dd = x[6 * n :].reshape(n, P)
            poses = lie.se3_retr(poses0, xi)
            disps = disps0 + dd
            rs = []
            for e in range(E):
                Gij = lie.se3_mul(poses[jj[e]], lie.se3_inv(poses[ii[e]]))
                pts = cam.iproj_disp(cam.CameraType.PINHOLE, intr_s, u, v, disps[ii[e]])
                pj = jnp.concatenate(
                    [lie.quat_rotate(Gij[3:7], pts[..., :3]) + Gij[:3] * pts[..., 3:4],
                     pts[..., 3:4]], axis=-1)
                coords = cam.proj_points(cam.CameraType.PINHOLE, intr_s, pj)
                rs.append((coords - prob["target"][e]).reshape(-1))
            return jnp.concatenate(rs)

        x0 = jnp.zeros(6 * n + n * P)
        J = np.array(jax.jacfwd(full_residual)(x0), np.float64)
        r = np.array(full_residual(x0), np.float64)
        w_list = []
        for e in range(E):
            Gij = lie.se3_mul(poses0[jj[e]], lie.se3_inv(poses0[ii[e]]))
            pts = cam.iproj_disp(cam.CameraType.PINHOLE, intr_s, u, v, disps0[ii[e]])
            pj = jnp.concatenate(
                [lie.quat_rotate(Gij[3:7], pts[..., :3]) + Gij[:3] * pts[..., 3:4],
                 pts[..., 3:4]], axis=-1)
            valid = pj[..., 2] > 0.1
            w_list.append((prob["weight"][e] * valid[:, None]).reshape(-1))
        w = np.array(jnp.concatenate(w_list), np.float64)

        H = (J.T * w) @ J
        b = -(J.T * w) @ r
        # damping exactly as the implementation applies it
        for k in range(n):
            sl = slice(6 * k, 6 * k + 6)
            H[sl, sl] += pose_damping * np.diag(np.diag(H[sl, sl])) + pose_ep * np.eye(6)
        dd_idx = np.arange(6 * n, 6 * n + n * P)
        H[dd_idx, dd_idx] += np.asarray(disp_damping, np.float64).reshape(-1) + cfg.disp_ep

        # Schur-reduce the disp block
        Hpp = H[: 6 * n, : 6 * n]
        Hpd = H[: 6 * n, 6 * n:]
        C = np.diag(H)[6 * n:]
        S = Hpp - (Hpd / C) @ Hpd.T
        b_red = b[: 6 * n] - (Hpd / C) @ b[6 * n:]

        # fix pose 0 like the implementation (zero rows/cols, unit diagonal)
        S[:6, :] = 0.0
        S[:, :6] = 0.0
        S[:6, :6] = np.eye(6)
        b_red[:6] = 0.0

        scale = np.abs(S).max()
        np.testing.assert_allclose(Hd, S, atol=2e-4 * scale, rtol=2e-3)
        np.testing.assert_allclose(
            bd, b_red, atol=2e-4 * max(np.abs(b_red).max(), 1.0), rtol=2e-3
        )

    def test_solve_direction_decreases_residual(self, rng):
        """One f32 iteration must reduce the weighted residual (solver sanity
        independent of precision)."""
        prob = make_problem(rng, n=3)
        n = prob["n"]
        cfg = ba.BAConfig(ht=HT, wd=WD, max_edges_per_frame=8)
        xi_noise = jnp.asarray(rng.normal(size=(n, 6)) * 0.01, jnp.float32)
        poses0 = lie.se3_retr(prob["poses_gt"], xi_noise)
        disps0 = prob["disps_gt"] * 1.03
        E = len(prob["ii"])
        slot_edge = jnp.asarray(ba.build_edge_slots(prob["ii"], prob["jj"], n, 8))

        def resid(poses, disps):
            coords, valid = geom.reproject(
                poses, disps.reshape(n, HT, WD), prob["intr_grid"],
                cam.CameraType.PINHOLE, prob["ii"], prob["jj"])
            r = coords.reshape(E, P, 2) - prob["target"]
            w = prob["weight"] * valid.reshape(E, P, 1)
            return float(jnp.sum(w * r * r))

        e0 = resid(poses0, disps0)
        poses1, disps1, _ = ba.ba_solve(
            cfg, poses0, disps0, prob["intr_full"], prob["target"], prob["weight"],
            prob["ii"], prob["jj"], jnp.ones((E,), bool), slot_edge,
            jnp.asarray([False] + [True] * (n - 1)), jnp.ones((n,), bool),
            jnp.full((n, P), 1e-4), prob["disps_gt"], jnp.zeros((n,)),
            jnp.int32(1), jnp.float32(1e-5), jnp.float32(1e-4),
        )
        e1 = resid(poses1, disps1)
        assert e1 < 0.2 * e0, (e0, e1)


# ----------------------------------------------------------- multi-view rig


def _rig_forward(poses, rig, disps_nd, intr_views, pi, qi, di, pj, qj):
    """Reference chain proj[rig_qj⁻¹·T_pj·T_pi⁻¹·rig_qi·iproj(d_di, K_qi), K_qj]
    (geom.py:187-298), built from the same primitives BA uses."""
    u, v = geom.pixel_grid(HT, WD)
    u, v = u.reshape(P), v.reshape(P)
    outs, valids = [], []
    for e in range(len(pi)):
        Ki = intr_views[qi[e]] / 8.0
        Kj = intr_views[qj[e]] / 8.0
        G = lie.se3_mul(
            lie.se3_inv(rig[qj[e]]),
            lie.se3_mul(poses[pj[e]],
                        lie.se3_mul(lie.se3_inv(poses[pi[e]]), rig[qi[e]])),
        )
        pts = cam.iproj_disp(cam.CameraType.PINHOLE, Ki, u, v, disps_nd[di[e]])
        q, t = G[3:7], G[:3]
        ph = jnp.concatenate(
            [lie.quat_rotate(q, pts[..., :3]) + t * pts[..., 3:4], pts[..., 3:4]], -1
        )
        outs.append(cam.proj_points(cam.CameraType.PINHOLE, Kj, ph))
        valids.append(ph[..., 2] > 0.1)
    return jnp.stack(outs), jnp.stack(valids)


class TestMultiViewRig:
    def test_two_view_rig_pose_and_rotation_recovery(self, rng):
        """2-view rig: cross-view + temporal edges; BA must recover the
        perturbed frame poses AND the perturbed rig-1 rotation
        (optimize_rig_rotation path, reference buffer.py:501-506)."""
        V, n = 2, 4
        ND = n * V
        intr_views = jnp.broadcast_to(
            jnp.asarray([WD * 12.0, WD * 12.0, WD * 4.0, HT * 4.0]), (V, 4)
        )
        # rig: view 0 identity; view 1 offset right + yawed
        rig_gt = jnp.stack([
            lie.se3_identity(),
            lie.se3_exp(jnp.asarray([0.25, 0.0, 0.0, 0.0, 0.12, 0.0], jnp.float32)),
        ])
        steps = []
        for k in range(n):
            xi = np.concatenate([
                [0.15 * k, 0.02 * rng.normal(), 0.02 * rng.normal()],
                0.01 * rng.normal(size=3),
            ])
            steps.append(lie.se3_exp(jnp.asarray(xi, jnp.float32)))
        poses_gt = jnp.stack(steps)

        u, v = geom.pixel_grid(HT, WD)
        base = 0.6 + 0.15 * jnp.sin(u / 3.0) * jnp.cos(v / 2.0)
        disps_gt = jnp.stack(
            [base + 0.02 * k + 0.01 * w for k in range(n) for w in range(V)]
        ).reshape(ND, P)

        # temporal edges expanded per view + cross-view edges per frame
        pi, qi, pj, qj = [], [], [], []
        for i in range(n - 1):
            for w in range(V):
                pi += [i, i + 1]
                pj += [i + 1, i]
                qi += [w, w]
                qj += [w, w]
        for i in range(n):  # cross-view (ii == jj → (v, v+1) pairs)
            pi += [i, i]
            pj += [i, i]
            qi += [0, 1]
            qj += [1, 0]
        pi = np.asarray(pi); pj = np.asarray(pj)
        qi = np.asarray(qi); qj = np.asarray(qj)
        di = pi * V + qi
        E = len(pi)

        target, valid = _rig_forward(
            poses_gt, rig_gt, disps_gt, intr_views, pi, qi, di, pj, qj
        )
        weight = jnp.ones((E, P, 2)) * valid[..., None]

        # perturb poses (fix 0,1) and rig-1 ROTATION
        xi_noise = jnp.asarray(rng.normal(size=(n, 6)) * 0.015, jnp.float32)
        xi_noise = xi_noise.at[0].set(0.0).at[1].set(0.0)
        poses0 = lie.se3_retr(poses_gt, xi_noise)
        rig0 = rig_gt.at[1].set(lie.se3_retr(
            rig_gt[1], jnp.asarray([0, 0, 0, 0.0, -0.04, 0.02], jnp.float32)
        ))

        cfg = ba.BAConfig(
            ht=HT, wd=WD, max_edges_per_frame=16, n_views=V, optimize_rig=True,
        )
        slot_edge = np.full((ND, 16), E, np.int32)
        fill = np.zeros(ND, np.int64)
        for e, d in enumerate(di):
            slot_edge[d, fill[d]] = e
            fill[d] += 1

        pose_mask = jnp.asarray([False, False] + [True] * (n - 2))
        disp_mask = jnp.zeros((ND,), bool)  # keep GT disps: isolate pose+rig
        poses1, rig1, _, _ = ba.ba_solve_mv(
            cfg, poses0, rig0, disps_gt, intr_views, target, weight,
            jnp.asarray(pi), jnp.asarray(qi), jnp.asarray(di),
            jnp.asarray(pj), jnp.asarray(qj),
            jnp.ones((E,), bool), jnp.asarray(slot_edge),
            pose_mask, disp_mask, jnp.full((ND, P), 1e-4),
            disps_gt, jnp.zeros((ND,)),
            jnp.int32(12), jnp.float32(1e-5), jnp.float32(1e-4),
        )
        err0 = pose_err(poses0, poses_gt)
        err1 = pose_err(poses1, poses_gt)
        assert err1 < 2e-3 and err1 < 0.1 * err0, (err0, err1)

        rot_err0 = float(jnp.linalg.norm(
            lie.se3_log(lie.se3_mul(rig0[1], lie.se3_inv(rig_gt[1])))[3:]))
        rot_err1 = float(jnp.linalg.norm(
            lie.se3_log(lie.se3_mul(rig1[1], lie.se3_inv(rig_gt[1])))[3:]))
        assert rot_err1 < 2e-3 and rot_err1 < 0.1 * rot_err0, (rot_err0, rot_err1)
        # rig view 0 stays fixed; rotation-only left-retraction preserves
        # the translation NORM (exp([0, phi]) rotates t, as in the reference
        # RigRotationOnlyRetractor: retr with translation rows zeroed)
        np.testing.assert_allclose(np.asarray(rig1[0]), np.asarray(rig_gt[0]), atol=1e-6)
        np.testing.assert_allclose(
            float(jnp.linalg.norm(rig1[1][:3])),
            float(jnp.linalg.norm(rig0[1][:3])), rtol=1e-5,
        )
