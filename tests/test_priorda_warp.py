"""PriorDA completion, warp ops, and sparse-tracks tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from vipe_tpu.ops import cameras as cam
from vipe_tpu.ops import lie
from vipe_tpu.ops.warp import bilinear_splat, camera_rays, reproject_depth
from vipe_tpu.priors.depth.priorda import (
    global_scale_shift,
    knn_scale_shift_completion,
)
from vipe_tpu.slam.sparse_tracks import DummySparseTracks, SparseTracks, build_sparse_tracks


class TestPriorDAAlignment:
    def test_global_scale_shift(self, rng):
        pred = rng.random((20, 30)).astype(np.float32)
        sparse = 2.5 * pred + 0.4
        mask = rng.random((20, 30)) > 0.8
        s, b = global_scale_shift(pred, sparse, mask)
        assert abs(s - 2.5) < 1e-4 and abs(b - 0.4) < 1e-4

    def test_knn_completion_exact_on_affine(self, rng):
        """If sparse = a·pred + b everywhere sampled, completion reproduces it."""
        H, W = 16, 20
        pred = (rng.random((H, W)) + 0.2).astype(np.float32)
        gt = 1.8 * pred + 0.1
        mask = np.zeros((H, W), bool)
        mask[rng.integers(0, H, 40), rng.integers(0, W, 40)] = True
        sparse = np.where(mask, gt, 0.0)
        out = np.asarray(knn_scale_shift_completion(pred, sparse, mask, K=5))
        np.testing.assert_allclose(out[mask], gt[mask], atol=1e-5)
        err = np.abs(out[~mask] - gt[~mask])
        assert float(np.median(err)) < 0.02

    def test_knn_completion_spatially_varying(self, rng):
        """Locally-varying scale: KNN tracks it better than a global fit."""
        H, W = 16, 20
        u = np.linspace(0, 1, W)[None].repeat(H, 0)
        pred = (0.5 + 0.3 * rng.random((H, W))).astype(np.float32)
        local_scale = 1.0 + u  # 1 → 2 left to right
        gt = local_scale * pred
        mask = np.zeros((H, W), bool)
        mask[::3, ::3] = True
        sparse = np.where(mask, gt, 0.0)
        out = np.asarray(knn_scale_shift_completion(pred, sparse, mask, K=5))
        s, b = global_scale_shift(pred, sparse, mask)
        global_out = pred * s + b
        knn_err = np.median(np.abs(out[~mask] - gt[~mask]))
        glob_err = np.median(np.abs(global_out[~mask] - gt[~mask]))
        assert knn_err < glob_err


class TestPriorDAFine:
    def test_fine_refine_runs_and_conditions(self, rng):
        """The conditioned refinement stage produces finite metric depth, and
        the condition channels actually reach the encoder (alpha_proj)."""
        from vipe_tpu.priors.depth.priorda import PriorDAModel

        model = PriorDAModel(variant="vits", input_size=70, K=5,
                             fine_variant="vits")
        # zero-init alpha_proj would make the condition a no-op — perturb it
        # so conditioning is observable
        ap = model.fine_net.params["vit"]["params"]["alpha_proj"]
        ap["kernel"] = 0.05 * rng.normal(size=ap["kernel"].shape).astype(
            np.float32
        )

        H, W = 48, 64
        rgb = rng.random((H, W, 3)).astype(np.float32)
        prompt = np.zeros((H, W), np.float32)
        prompt[::5, ::5] = 2.0 + rng.random((10, 13)).astype(np.float32)

        out1 = model.complete(rgb, prompt)
        assert out1.shape == (H, W) and np.isfinite(out1).all()

        prompt2 = prompt * 3.0
        out2 = model.complete(rgb, prompt2)
        assert np.abs(out1 - out2).max() > 1e-5  # condition changed output

    def test_complete_batch_matches_per_frame(self, rng):
        """complete_batch (one stacked coarse + fine forward per chunk) is
        EXACTLY the per-frame path given identical net outputs — the
        batching must not change the per-frame alignment/conditioning math.
        Real nets are batch-size-sensitive at f32 epsilon and the KNN 2×2
        solves amplify that through near-singular systems (measured 1e-6 →
        1e4 with random weights), so the nets are stubbed deterministic and
        equality is required bitwise."""
        from vipe_tpu.priors.depth.priorda import PriorDAModel

        model = PriorDAModel(variant="vits", input_size=70, K=5,
                             fine_variant="vits")

        class _StubNet:
            """Batch-invariant stand-in: disp = per-pixel channel mix of the
            (possibly condition-concatenated) input."""

            def __call__(self, imgs, condition=None):
                import jax.numpy as jnp

                x = jnp.asarray(imgs)
                out = 0.3 + 0.5 * x.mean(-1)
                if condition is not None:
                    out = out + 0.1 * jnp.asarray(condition).mean(-1)
                return out

        model.net = _StubNet()
        model.fine_net = _StubNet()
        H, W = 48, 64
        rgbs, prompts = [], []
        for k in range(3):
            rgbs.append(rng.random((H, W, 3)).astype(np.float32))
            p = np.zeros((H, W), np.float32)
            p[::5, ::5] = 2.0 + rng.random((10, 13)).astype(np.float32)
            if k == 2:
                p[:] = 0.0  # empty prompt → NaN map, exercised in-batch
            prompts.append(p)
        batched = model.complete_batch(rgbs, prompts)
        assert np.isnan(batched[2]).all()
        for rgb, prompt, got in zip(rgbs, prompts, batched):
            want = model.complete(rgb, prompt)
            np.testing.assert_array_equal(got, want)

    def test_coarse_only_flag(self, rng):
        from vipe_tpu.priors.depth.priorda import PriorDAModel

        model = PriorDAModel(variant="vits", input_size=70, K=5,
                             coarse_only=True)
        assert not hasattr(model, "fine_net")
        H, W = 32, 40
        rgb = rng.random((H, W, 3)).astype(np.float32)
        prompt = np.zeros((H, W), np.float32)
        prompt[::4, ::4] = 1.5
        out = model.complete(rgb, prompt)
        assert out.shape == (H, W) and np.isfinite(out).all()

    def test_conditioned_converter_structure(self, rng):
        """Conditioned checkpoint (with alpha_proj) converts to the exact
        flax tree of the cond_dim=3 net."""
        import jax

        from tests.test_dav2 import make_synthetic_dav2_sd
        from vipe_tpu.models import convert as mconvert
        from vipe_tpu.priors.depth.dav2 import DepthAnythingV2Net

        sd = make_synthetic_dav2_sd(rng, cond_dim=3)
        converted = mconvert.convert_dav2(sd)
        fresh = DepthAnythingV2Net("vits", max_depth=None, cond_dim=3)
        fi = {jax.tree_util.keystr(p): v.shape
              for p, v in jax.tree_util.tree_leaves_with_path(fresh.params)}
        ci = {jax.tree_util.keystr(p): np.shape(v)
              for p, v in jax.tree_util.tree_leaves_with_path(converted)}
        assert fi == ci

        net = DepthAnythingV2Net("vits", max_depth=None, params=converted,
                                 cond_dim=3)
        x = jnp.asarray(rng.random((1, 70, 98, 3)), jnp.float32)
        cond = jnp.asarray(rng.random((1, 70, 98, 3)), jnp.float32)
        out = net(x, cond)
        assert out.shape == (1, 70, 98)
        # alpha_proj is live: different conditions → different outputs
        out2 = net(x, cond * 2.0)
        assert float(jnp.abs(out - out2).max()) > 0.0


class TestWarp:
    def test_splat_identity(self, rng):
        H, W = 8, 10
        vals = rng.random((H * W, 1)).astype(np.float32)
        u, v = np.meshgrid(np.arange(W, dtype=np.float32),
                           np.arange(H, dtype=np.float32), indexing="xy")
        coords = jnp.asarray(np.stack([u.reshape(-1), v.reshape(-1)], -1))
        out, wacc = bilinear_splat(jnp.asarray(vals), coords,
                                   jnp.ones(H * W), (H, W))
        np.testing.assert_allclose(np.asarray(out[..., 0]),
                                   vals.reshape(H, W), atol=1e-5)
        np.testing.assert_allclose(np.asarray(wacc), 1.0, atol=1e-5)

    def test_reproject_identity_pose(self):
        H, W = 12, 16
        intr = jnp.asarray([20.0, 20.0, 8.0, 6.0])
        depth = jnp.full((H, W), 2.0)
        ident = lie.se3_identity()
        out, wacc = reproject_depth(depth, intr, ident, ident, (H, W))
        inner = np.asarray(out)[2:-2, 2:-2]
        np.testing.assert_allclose(inner, 2.0, atol=1e-3)

    def test_reproject_translation_shifts_content(self):
        H, W = 12, 16
        intr = jnp.asarray([20.0, 20.0, 8.0, 6.0])
        depth = jnp.full((H, W), 2.0)
        src_c2w = lie.se3_identity()
        # camera moves +x by 0.2 → content shifts −x by fx·t/z = 2 px
        dst_w2c = lie.se3_exp(jnp.asarray([-0.2, 0, 0, 0, 0, 0.0]))
        out, wacc = reproject_depth(depth, intr, src_c2w, dst_w2c, (H, W))
        assert float(np.asarray(wacc)[6, 2]) > 0  # shifted region covered
        assert float(np.asarray(wacc)[6, W - 1]) == 0  # vacated edge empty

    def test_camera_rays_unit(self):
        rays = camera_rays(jnp.asarray([20.0, 20.0, 8.0, 6.0]), 12, 16)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(rays), axis=-1), 1.0, atol=1e-5)
        pano = camera_rays(jnp.zeros(4), 8, 16, cam.CameraType.PANORAMA)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(pano), axis=-1), 1.0, atol=1e-5)


class TestSparseTracks:
    def test_dummy_disabled(self):
        st = build_sparse_tracks({"name": "dummy"})
        assert not st.enabled
        st.track_image(0, None)  # no-op

    def test_correspondences_and_splat(self):
        st = SparseTracks()
        st.add_observation(0, 1, 0, [8.0, 16.0])
        st.add_observation(0, 1, 1, [12.0, 16.0])
        st.add_observation(0, 2, 0, [40.0, 24.0])
        assert st.get_correspondences(0, 0, 1) == [1]
        assert st.n_tracks(0, 0) == 2
        target, weight = st.compute_dense_disp_target_weight(
            np.asarray([0]), np.asarray([0]),
            np.asarray([0]), np.asarray([1]),
            image_size=(64, 64), dense_disp_size=(8, 8),
        )
        # keypoint 1 at (8,16) full-res → grid cell (2,1); target 12·(8/64)=1.5
        assert weight[0, 2, 1, 0] == 1.0
        np.testing.assert_allclose(target[0, 2, 1], [1.5, 2.0])
        assert weight.sum() == 2.0  # one cell, two channels

    def test_cross_view_edges_skipped(self):
        st = SparseTracks(n_views=2)
        st.add_observation(0, 1, 0, [8.0, 16.0])
        st.add_observation(0, 1, 1, [12.0, 16.0])
        _, weight = st.compute_dense_disp_target_weight(
            np.asarray([0]), np.asarray([0]),
            np.asarray([1]), np.asarray([1]),  # view 0 → view 1
            image_size=(64, 64), dense_disp_size=(8, 8),
        )
        assert weight.sum() == 0.0

    def test_unknown_backend_raises(self):
        with pytest.raises(ValueError):
            build_sparse_tracks({"name": "cuvslam"})
