"""Fused multi-round GRU+BA (FactorGraph.update_fused) must match the
sequential update() loop — poses/disps/targets/weights/damping — with a real
traceable DroidNet, including the inactive-edge BA block and the speculative
distance-matrix token."""

import copy

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vipe_tpu.ops import cameras as cam
from vipe_tpu.slam.buffer import GraphBuffer
from vipe_tpu.slam.factor_graph import FactorGraph
from vipe_tpu.slam.system import make_droidnet_fns

H, W = 48, 64
HT, WD = H // 8, W // 8
N = 6


@pytest.fixture(scope="module")
def tiny_droidnet():
    from vipe_tpu.models.droidnet import init_droidnet

    return init_droidnet(jax.random.PRNGKey(0), ht=HT, wd=WD)


def _make_graph(tiny_droidnet, seed=0, corr_mode="volume",
                corr_dtype="bf16"):
    model, params = tiny_droidnet
    ef, ec, uf = make_droidnet_fns(model)
    rng = np.random.default_rng(seed)
    buf = GraphBuffer(height=H, width=W, buffer_size=32)
    for k in range(N):
        img = jnp.asarray((rng.random((H, W, 3)) * 255).astype(np.uint8))
        fmap = ef(params, img[None])[0]
        net, inp = ec(params, img[None])
        buf.append_keyframe(
            k, img, fmap, net[0], inp[0],
            intrinsics=np.asarray([W, W, W / 2, H / 2], np.float32),
        )
        # small random pose walk + disp texture so BA has signal
        buf.poses = buf.poses.at[k, 0].set(0.1 * k + 0.01 * rng.normal())
        buf.disps = buf.disps.at[k].add(
            0.1 * jnp.asarray(rng.random((HT, WD)), jnp.float32)
        )
    g = FactorGraph(buf, uf, params, max_factors=16, incremental=True,
                    corr_mode=corr_mode, corr_dtype=corr_dtype)
    g.add_neighborhood_factors(0, N, r=1)
    return buf, g


def _snapshot(buf, g):
    return {
        "poses": np.asarray(buf.poses[:N]),
        "disps": np.asarray(buf.disps[:N]),
        "target": np.asarray(g.target[: g.n_edges]),
        "weight": np.asarray(g.weight[: g.n_edges]),
        "damping": np.asarray(g.damping[:8]),
        "age": g.age[: g.n_edges].copy(),
    }


class TestFusedUpdateEquivalence:
    def test_matches_sequential_updates(self, tiny_droidnet):
        buf_a, g_a = _make_graph(tiny_droidnet, seed=3)
        buf_b, g_b = _make_graph(tiny_droidnet, seed=3)

        for _ in range(3):
            g_a.update(use_inactive=True)
        g_b.update_fused(3, use_inactive=True)

        sa, sb = _snapshot(buf_a, g_a), _snapshot(buf_b, g_b)
        for key in sa:
            # 8e-3: fused vs sequential fuse differently (bf16 corr, f32
            # accum order differs per XLA codegen/host ISA) and 3 GRU+BA
            # rounds amplify the rounding drift — tighter bounds were flaky
            # across machines (measured max |Δtarget| 3.9e-3 / rel 6.6e-3,
            # at bf16's ~8e-3 relative resolution)
            np.testing.assert_allclose(
                sa[key], sb[key], rtol=8e-3, atol=8e-3,
                err_msg=f"mismatch in {key}",
            )

    def test_corr_mode_alt_one_round(self, tiny_droidnet):
        """corr_mode='alt' (packed features, dots recomputed at lookup) vs
        the materialized-volume default, ONE GRU+BA round: the only numeric
        difference is bf16 volume rounding vs f32 on-the-fly dots (unit
        parity ≤2e-2 per corr feature, tests/test_pallas_corr.py), so a
        single round must stay close.  Full-run trajectories diverge
        chaotically with random weights (as fused-vs-sequential already
        does at 1e-3/3 rounds above) — the per-round bound is the
        meaningful equivalence statement."""
        buf_a, g_a = _make_graph(tiny_droidnet, seed=3)
        buf_b, g_b = _make_graph(tiny_droidnet, seed=3, corr_mode="alt")
        assert g_b.corr_pyr[0].ndim == 4 and len(g_b.corr_pyr) == 5

        g_a.update(use_inactive=True)
        g_b.update(use_inactive=True)
        sa, sb = _snapshot(buf_a, g_a), _snapshot(buf_b, g_b)
        for key in sa:
            np.testing.assert_allclose(
                sa[key], sb[key], rtol=0, atol=2e-2,
                err_msg=f"mismatch in {key}",
            )

    def test_corr_dtype_int8_one_round(self, tiny_droidnet):
        """corr_dtype='int8' (quantized stored volumes, per-edge dequant
        scales — the ≥3-video interleave memory lever) vs the bf16 default,
        one GRU+BA round: int8 lookup parity is ≤1e-2 relative
        (ops/corr.quantize_volume), so a single round must stay close."""
        buf_a, g_a = _make_graph(tiny_droidnet, seed=3)
        buf_b, g_b = _make_graph(tiny_droidnet, seed=3, corr_dtype="int8")
        assert g_b.corr_pyr[0].dtype == jnp.int8
        assert g_b.corr_scale is not None

        g_a.update(use_inactive=True)
        g_b.update(use_inactive=True)
        sa, sb = _snapshot(buf_a, g_a), _snapshot(buf_b, g_b)
        for key in sa:
            np.testing.assert_allclose(
                sa[key], sb[key], rtol=0, atol=2e-2,
                err_msg=f"mismatch in {key}",
            )

    def test_corr_dtype_int8_row_machinery(self, tiny_droidnet):
        """Quantized rows and their scales must track the same add/remove/
        permute machinery as bf16 volumes: after evicting edges (store=True)
        and removing a keyframe, the dequantized stored rows must equal a
        freshly-built pyramid for the surviving edges."""
        from vipe_tpu.slam.factor_graph import _jitted_edge_corr

        buf, g = _make_graph(tiny_droidnet, seed=7, corr_dtype="int8")
        # evict two edges into the inactive store, then drop a keyframe
        mask = np.zeros(g.n_edges, bool)
        mask[1] = mask[3] = True
        g.rm_factors(mask, store=True)
        g.rm_keyframe(2)
        n = g.n_edges
        assert n > 0
        di = jnp.asarray(g.exp[: n, 2], jnp.int32)
        dj = jnp.asarray(g.exp[: n, 3] * g.V + g.exp[: n, 4], jnp.int32)
        fresh = _jitted_edge_corr(g.corr_levels, buf.fmaps, di, dj)
        for l in range(g.corr_levels):
            deq = (
                np.asarray(g.corr_pyr[l][:n], np.float32)
                * np.asarray(g.corr_scale[l][:n])[:, None, None, None, None]
            )
            ref = np.asarray(fresh[l], np.float32)
            scale = np.abs(ref).max() + 1e-9
            assert np.abs(deq - ref).max() / scale < 1.5e-2

    def test_matches_with_inactive_edges(self, tiny_droidnet):
        buf_a, g_a = _make_graph(tiny_droidnet, seed=5)
        buf_b, g_b = _make_graph(tiny_droidnet, seed=5)
        for g in (g_a, g_b):
            # move two edges to the inactive store
            mask = np.zeros(g.n_edges, bool)
            mask[:2] = True
            g.rm_factors(mask, store=True)

        for _ in range(2):
            g_a.update(use_inactive=True)
        g_b.update_fused(2, use_inactive=True)

        sa, sb = _snapshot(buf_a, g_a), _snapshot(buf_b, g_b)
        for key in ("poses", "disps", "target", "weight"):
            np.testing.assert_allclose(
                sa[key], sb[key], rtol=2e-4, atol=2e-4,
                err_msg=f"mismatch in {key}",
            )

    def test_frontend_step_matches_sequence(self, tiny_droidnet):
        """frontend_step_fused (one dispatch) must equal the sequential
        iters1 → distance → iters2 → const-vel/disp-init path, including the
        returned removal distance."""
        from vipe_tpu.ops import geom
        from vipe_tpu.slam.frontend import (
            _jitted_const_velocity,
            _jitted_mean_disp_init,
        )

        buf_a, g_a = _make_graph(tiny_droidnet, seed=9)
        buf_b, g_b = _make_graph(tiny_droidnet, seed=9)
        t1 = N  # next slot
        kf_thresh = 0.0  # always keep (exercise the cond keep-branch)

        # sequential reference path
        g_a.update_fused(2, use_inactive=True)
        d_ref = float(jnp.max(buf_a.frame_distance(
            jnp.asarray([t1 - 3], jnp.int32), jnp.asarray([t1 - 2], jnp.int32),
            beta=0.3, bidirectional=True,
        )))
        g_a.update_fused(1, use_inactive=True)
        buf_a.poses = _jitted_const_velocity(buf_a.poses, jnp.int32(t1))
        buf_a.disps = _jitted_mean_disp_init(buf_a.disps, jnp.int32(t1))

        assert g_b.can_fuse_frontend_step
        d = g_b.frontend_step_fused(
            2, 1, d_pair=(t1 - 3, t1 - 2), kf_thresh=kf_thresh, beta=0.3,
            slot_t1=t1, const_vel=True,
        )
        np.testing.assert_allclose(d, d_ref, rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(buf_a.poses[: N + 1]), np.asarray(buf_b.poses[: N + 1]),
            rtol=2e-4, atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(buf_a.disps[: N + 1]), np.asarray(buf_b.disps[: N + 1]),
            rtol=2e-4, atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(g_a.weight[: g_a.n_edges]),
            np.asarray(g_b.weight[: g_b.n_edges]),
            rtol=2e-4, atol=2e-4,
        )

    def test_frontend_step_skip_branch(self, tiny_droidnet):
        """A huge threshold takes the removal branch: iters2 and the slot
        init must NOT run."""
        buf_a, g_a = _make_graph(tiny_droidnet, seed=10)
        buf_b, g_b = _make_graph(tiny_droidnet, seed=10)
        t1 = N

        g_a.update_fused(2, use_inactive=True)
        d = g_b.frontend_step_fused(
            2, 1, d_pair=(t1 - 3, t1 - 2), kf_thresh=1e9, beta=0.3,
            slot_t1=t1, const_vel=True,
        )
        assert d < 1e9
        np.testing.assert_allclose(
            np.asarray(buf_a.poses[: N + 1]), np.asarray(buf_b.poses[: N + 1]),
            rtol=2e-4, atol=2e-4,
        )

    def test_motion_only_fused_matches_loop(self, tiny_droidnet):
        """The inner filler's fused motion-only rounds must equal the
        sequential update() loop (disps untouched)."""
        buf_a, g_a = _make_graph(tiny_droidnet, seed=12)
        buf_b, g_b = _make_graph(tiny_droidnet, seed=12)
        d0 = np.asarray(buf_b.disps[:N])

        for _ in range(3):
            g_a.update(1, N, motion_only=True, limited_disp=True)
        g_b.update_fused(3, 1, N, motion_only=True, limited_disp=True)

        np.testing.assert_allclose(
            np.asarray(buf_a.poses[:N]), np.asarray(buf_b.poses[:N]),
            rtol=2e-4, atol=2e-4,
        )
        np.testing.assert_allclose(np.asarray(buf_b.disps[:N]), d0, atol=1e-6)

    def test_windowed_base_offset_matches_sequential(self, tiny_droidnet):
        """When the oldest frames have NO edges, the fused path shifts its
        window (base > 0); results must match the unwindowed sequential
        path exactly."""
        buf_a, g_a = _make_graph(tiny_droidnet, seed=21)
        buf_b, g_b = _make_graph(tiny_droidnet, seed=21)
        for g in (g_a, g_b):
            # drop every edge touching frames 0-2 → window starts at 3
            m = (g.ii[: g.n_edges] < 3) | (g.jj[: g.n_edges] < 3)
            g.rm_factors(m, store=False)
            assert g.ii[: g.n_edges].min() >= 3

        # confirm the fused prep actually windows
        _, Nb, base, _ = g_b._fused_prep(None, None, False, False)
        assert base == 3  # Nb stays at the 16 bucket minimum at this scale

        for _ in range(2):
            g_a.update(use_inactive=False)
        g_b.update_fused(2, use_inactive=False)

        np.testing.assert_allclose(
            np.asarray(buf_a.poses[:N]), np.asarray(buf_b.poses[:N]),
            rtol=2e-4, atol=2e-4,
        )
        # looser: under the 8-virtual-device test env, XLA partitions the two
        # program structures differently and the bf16 GRU amplifies the
        # rounding over 2 rounds (exact to 5e-7 on a single device)
        np.testing.assert_allclose(
            np.asarray(buf_a.disps[:N]), np.asarray(buf_b.disps[:N]),
            rtol=5e-3, atol=5e-3,
        )

    def test_update_batch_fused_matches_loop(self, tiny_droidnet):
        """The single-dispatch backend program (_jitted_backend_steps, with
        on-the-fly chunk corr volumes) must match the per-step fallback loop
        (cached materialized pyramids) over multiple steps.

        Tolerances are bf16-scale: DroidNet computes its convs in bf16, and
        the two program structures round differently (the strict structural
        check is test_update_batch_fused_structural below)."""
        buf_a, g_a = _make_graph(tiny_droidnet, seed=31)
        buf_b, g_b = _make_graph(tiny_droidnet, seed=31)

        # force g_a onto the fallback loop path without changing the math:
        # host_only only switches dispatch granularity, not semantics
        uf = g_a.update_fn

        def uf_loop(*a, **k):
            return uf(*a, **k)

        uf_loop.host_only = True
        g_a.update_fn = uf_loop

        g_a.update_batch(itrs=2, steps=3)
        g_b.update_batch(itrs=2, steps=3)

        sa, sb = _snapshot(buf_a, g_a), _snapshot(buf_b, g_b)
        for key in ("poses", "disps", "target", "weight", "damping"):
            np.testing.assert_allclose(
                sa[key], sb[key], rtol=2e-2, atol=2e-2,
                err_msg=f"mismatch in {key}",
            )

    def test_update_batch_fused_structural(self, tiny_droidnet):
        """Strict (f32) equivalence of the fused backend program vs the
        fallback loop, using a deterministic pure-f32 traceable update_fn —
        proves chunking/scatter/damping/BA wiring is identical; the DroidNet
        variant above then only adds bf16 rounding."""
        import jax.numpy as jnp

        def pseudo_update(params, net, inp, corr, motn, ii, jj, num_seg):
            net2 = jnp.tanh(
                net * 0.9
                + 0.1 * corr.mean(-1, keepdims=True)
                + 0.05 * inp[..., : net.shape[-1]]
            )
            delta = 0.01 * jnp.tanh(corr[..., :2] + motn[..., 2:4])
            weight = jax.nn.sigmoid(corr[..., 4:6] * 0.1 + motn[..., :2])
            eta = jax.ops.segment_sum(
                jnp.mean(weight, -1), ii, num_segments=num_seg
            )
            return net2, delta, weight, eta

        buf_a, g_a = _make_graph(tiny_droidnet, seed=35)
        buf_b, g_b = _make_graph(tiny_droidnet, seed=35)

        def pseudo_loop(*a, **k):
            return pseudo_update(*a, **k)

        pseudo_loop.host_only = True
        g_a.update_fn = pseudo_loop
        g_b.update_fn = pseudo_update

        g_a.update_batch(itrs=2, steps=3)
        g_b.update_batch(itrs=2, steps=3)

        sa, sb = _snapshot(buf_a, g_a), _snapshot(buf_b, g_b)
        for key in ("poses", "disps", "target", "weight", "damping"):
            # 1e-4: the pseudo update is f32 but consumes the bf16 corr
            # volume, whose lookup fuses differently in the loop vs fused
            # program — a one-ulp bf16 input difference shows up as ~3e-5
            # post-sigmoid; wiring bugs would be orders larger
            np.testing.assert_allclose(
                sa[key], sb[key], rtol=1e-4, atol=1e-4,
                err_msg=f"mismatch in {key}",
            )

    def test_update_batch_fused_intrinsics(self, tiny_droidnet):
        """optimize_intrinsics through the fused backend program updates the
        buffer intrinsics identically to the loop path (strict f32 check via
        the deterministic pseudo update_fn — this also guards the per-step
        intrinsics REFRESH in the fallback loop: reprojections must use the
        post-BA intrinsics, not the values captured before step 0)."""
        import jax.numpy as jnp

        def pseudo_update(params, net, inp, corr, motn, ii, jj, num_seg):
            net2 = jnp.tanh(
                net * 0.9
                + 0.1 * corr.mean(-1, keepdims=True)
                + 0.05 * inp[..., : net.shape[-1]]
            )
            delta = 0.01 * jnp.tanh(corr[..., :2] + motn[..., 2:4])
            weight = jax.nn.sigmoid(corr[..., 4:6] * 0.1 + motn[..., :2])
            eta = jax.ops.segment_sum(
                jnp.mean(weight, -1), ii, num_segments=num_seg
            )
            return net2, delta, weight, eta

        buf_a, g_a = _make_graph(tiny_droidnet, seed=33)
        buf_b, g_b = _make_graph(tiny_droidnet, seed=33)

        def pseudo_loop(*a, **k):
            return pseudo_update(*a, **k)

        pseudo_loop.host_only = True
        g_a.update_fn = pseudo_loop
        g_b.update_fn = pseudo_update

        g_a.update_batch(itrs=2, steps=2, optimize_intrinsics=True)
        g_b.update_batch(itrs=2, steps=2, optimize_intrinsics=True)

        assert float(buf_b.intrinsics[0]) != W  # the focal actually moved
        np.testing.assert_allclose(
            np.asarray(buf_a.intrinsics), np.asarray(buf_b.intrinsics),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(buf_a.poses[:N]), np.asarray(buf_b.poses[:N]),
            rtol=1e-5, atol=1e-5,
        )

    def test_filler_fused_matches_loop(self, tiny_droidnet):
        """The single-dispatch inner-filler chunk (const-velocity init +
        in-program corr build + 10 motion-only rounds) must match the
        FactorGraph loop path."""
        from vipe_tpu.slam.inner_filler import InnerFiller

        model, params = tiny_droidnet
        from vipe_tpu.slam.system import make_droidnet_fns

        ef, ec, uf = make_droidnet_fns(model)
        results = {}
        for mode in ("fused", "loop"):
            rng = np.random.default_rng(17)
            buf = GraphBuffer(height=H, width=W, buffer_size=32)
            # 4 keyframes at strided timestamps
            for k in range(4):
                img = jnp.asarray(
                    (rng.random((H, W, 3)) * 255).astype(np.uint8)
                )
                fmap = ef(params, img[None])[0]
                net, inp = ec(params, img[None])
                buf.append_keyframe(
                    3 * k, img, fmap, net[0], inp[0],
                    intrinsics=np.asarray([W, W, W / 2, H / 2], np.float32),
                )
                buf.poses = buf.poses.at[k, 0].set(0.15 * k)
                buf.disps = buf.disps.at[k].add(
                    0.1 * jnp.asarray(rng.random((HT, WD)), jnp.float32)
                )
            filler = InnerFiller(
                buf, uf, params, {"infill_chunk_size": 5}
            )
            filler.set_start_idx(buf.n_frames)
            # 5 non-keyframes (timestamps interleaved)
            for t in (1, 2, 4, 5, 7):
                img = jnp.asarray(
                    (rng.random((H, W, 3)) * 255).astype(np.uint8)
                )
                fmap = ef(params, img[None])[0]
                net, inp = ec(params, img[None])
                buf.append_keyframe(t, img, fmap, net[0], inp[0])
            if mode == "loop":
                filler._compute_loop()
            else:
                assert filler._can_fuse
                filler._compute_fused()
            results[mode] = filler.get_result().poses

        np.testing.assert_allclose(
            results["fused"], results["loop"], rtol=2e-2, atol=2e-2,
        )
        # the interpolation must actually have moved the poses
        assert np.abs(results["fused"][:, 0]).max() > 1e-3

    def test_distance_token_matches_fresh(self, tiny_droidnet):
        buf, g = _make_graph(tiny_droidnet, seed=7)
        nb, w0, tok = g.submit_distance_matrix(beta=0.3)
        fresh = np.asarray(g.submit_distance_matrix(beta=0.3)[2])
        np.testing.assert_allclose(np.asarray(tok), fresh, rtol=1e-5)
        assert w0 == 0 and nb >= buf.n_frames

    def test_windowed_distance_matrix(self, tiny_droidnet):
        """A windowed matrix must equal the corresponding block of the
        full one."""
        buf, g = _make_graph(tiny_droidnet, seed=8)
        _, _, full = g.submit_distance_matrix(beta=0.3)
        nb, w0, win = g.submit_distance_matrix(beta=0.3, window=4)
        assert w0 == buf.n_frames - 4
        span = buf.n_frames - w0
        np.testing.assert_allclose(
            np.asarray(win)[:span, :span],
            np.asarray(full)[w0: w0 + span, w0: w0 + span], rtol=1e-5,
        )


# ------------------------------------------------------------ multiview (rig)

VV = 2


def _make_graph_mv(tiny_droidnet, seed=0):
    """2-view rig graph with a real traceable DroidNet (the V > 1 analog of
    _make_graph): per-view slots, a translated rig, per-view intrinsics."""
    model, params = tiny_droidnet
    ef, ec, uf = make_droidnet_fns(model)
    rng = np.random.default_rng(seed)
    rig = np.asarray(
        [[0, 0, 0, 0, 0, 0, 1], [0.2, 0, 0, 0, 0, 0, 1]], np.float32
    )
    buf = GraphBuffer(height=H, width=W, buffer_size=32, n_views=VV, rig=rig)
    for k in range(N):
        imgs = jnp.asarray(
            (rng.random((VV, H, W, 3)) * 255).astype(np.uint8)
        )
        fmap = ef(params, imgs)
        nets, inps = ec(params, imgs)
        buf.append_keyframe(
            k, imgs, fmap, nets, inps,
            intrinsics=np.asarray([[W, W, W / 2, H / 2]] * VV, np.float32),
        )
        buf.poses = buf.poses.at[k, 0].set(0.1 * k + 0.01 * rng.normal())
        buf.disps = buf.disps.at[VV * k: VV * (k + 1)].add(
            0.1 * jnp.asarray(rng.random((VV, HT, WD)), jnp.float32)
        )
    g = FactorGraph(buf, uf, params, max_factors=16, incremental=True)
    g.add_neighborhood_factors(0, N, r=1)
    return buf, g


def _snapshot_mv(buf, g):
    nV = g.n_edges * VV
    return {
        "poses": np.asarray(buf.poses[:N]),
        "disps": np.asarray(buf.disps[: N * VV]),
        "target": np.asarray(g.target[:nV]),
        "weight": np.asarray(g.weight[:nV]),
        "damping": np.asarray(g.damping[: N * VV]),
        "age": g.age[: g.n_edges].copy(),
    }


class TestFusedUpdateMV:
    """The mv fused programs (VERDICT r04 item 7: rigs previously fell back
    to the multi-dispatch loop) must match the sequential update() loop."""

    def test_mv_fused_matches_sequential(self, tiny_droidnet):
        buf_a, g_a = _make_graph_mv(tiny_droidnet, seed=3)
        buf_b, g_b = _make_graph_mv(tiny_droidnet, seed=3)

        for _ in range(3):
            g_a.update(use_inactive=True)
        g_b.update_fused(3, use_inactive=True)

        sa, sb = _snapshot_mv(buf_a, g_a), _snapshot_mv(buf_b, g_b)
        for key in sa:
            np.testing.assert_allclose(
                sa[key], sb[key], rtol=8e-3, atol=8e-3,
                err_msg=f"mismatch in {key}",
            )

    def test_mv_fused_with_inactive_edges(self, tiny_droidnet):
        buf_a, g_a = _make_graph_mv(tiny_droidnet, seed=5)
        buf_b, g_b = _make_graph_mv(tiny_droidnet, seed=5)
        for g in (g_a, g_b):
            g.rm_factors(
                (g.ii[: g.n_edges] == 0) & (g.jj[: g.n_edges] == 1),
                store=True,
            )
        assert len(g_a.ii_inac) > 0

        g_a.update(use_inactive=True)
        g_b.update_fused(1, use_inactive=True)
        sa, sb = _snapshot_mv(buf_a, g_a), _snapshot_mv(buf_b, g_b)
        for key in sa:
            np.testing.assert_allclose(
                sa[key], sb[key], rtol=2e-3, atol=2e-3,
                err_msg=f"mismatch in {key}",
            )

    def test_mv_frontend_step_matches_sequence(self, tiny_droidnet):
        """frontend_step_fused for a rig (one dispatch) must equal the
        sequential iters1 → per-view bidirectional distance → iters2 →
        const-vel/disp-init path."""
        from vipe_tpu.slam.frontend import (
            _jitted_const_velocity,
            _jitted_mean_disp_init,
        )

        buf_a, g_a = _make_graph_mv(tiny_droidnet, seed=9)
        buf_b, g_b = _make_graph_mv(tiny_droidnet, seed=9)
        t1 = N

        for _ in range(2):
            g_a.update(use_inactive=True)
        d_ref = float(jnp.max(buf_a.frame_distance(
            jnp.asarray([t1 - 3], jnp.int32),
            jnp.asarray([t1 - 2], jnp.int32),
            beta=0.3, bidirectional=True,
        )))
        g_a.update(use_inactive=True)
        buf_a.poses = _jitted_const_velocity(buf_a.poses, jnp.int32(t1))
        buf_a.disps = _jitted_mean_disp_init(
            buf_a.disps, jnp.int32(t1), VV
        )

        assert g_b.can_fuse_frontend_step
        d = g_b.frontend_step_fused(
            2, 1, d_pair=(t1 - 3, t1 - 2), kf_thresh=0.0, beta=0.3,
            slot_t1=t1, const_vel=True,
        )
        np.testing.assert_allclose(d, d_ref, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(buf_a.poses[: N + 1]),
            np.asarray(buf_b.poses[: N + 1]), rtol=2e-3, atol=2e-3,
        )
        np.testing.assert_allclose(
            np.asarray(buf_a.disps[: (N + 1) * VV]),
            np.asarray(buf_b.disps[: (N + 1) * VV]), rtol=2e-3, atol=2e-3,
        )
        np.testing.assert_allclose(
            np.asarray(g_a.weight[: g_a.n_edges * VV]),
            np.asarray(g_b.weight[: g_b.n_edges * VV]),
            rtol=2e-3, atol=2e-3,
        )

    def test_mv_frontend_step_skip_branch(self, tiny_droidnet):
        """A huge threshold takes the removal branch: iters2 and the slot
        init must NOT run (rig variant)."""
        buf_a, g_a = _make_graph_mv(tiny_droidnet, seed=10)
        buf_b, g_b = _make_graph_mv(tiny_droidnet, seed=10)
        t1 = N

        for _ in range(2):
            g_a.update(use_inactive=True)
        d = g_b.frontend_step_fused(
            2, 1, d_pair=(t1 - 3, t1 - 2), kf_thresh=1e9, beta=0.3,
            slot_t1=t1, const_vel=True,
        )
        assert d < 1e9
        np.testing.assert_allclose(
            np.asarray(buf_a.poses[: N + 1]),
            np.asarray(buf_b.poses[: N + 1]), rtol=2e-3, atol=2e-3,
        )

    def test_mv_motion_only_fused_matches_loop(self, tiny_droidnet):
        """Rig filler rounds: fused motion-only must equal the loop and
        leave disps untouched."""
        buf_a, g_a = _make_graph_mv(tiny_droidnet, seed=12)
        buf_b, g_b = _make_graph_mv(tiny_droidnet, seed=12)
        d0 = np.asarray(buf_b.disps[: N * VV])

        for _ in range(3):
            g_a.update(1, N, motion_only=True, limited_disp=True)
        g_b.update_fused(3, 1, N, motion_only=True, limited_disp=True)

        np.testing.assert_allclose(
            np.asarray(buf_a.poses[:N]), np.asarray(buf_b.poses[:N]),
            rtol=2e-3, atol=2e-3,
        )
        np.testing.assert_allclose(
            np.asarray(buf_b.disps[: N * VV]), d0, atol=1e-6
        )
