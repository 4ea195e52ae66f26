"""Tests for config composition, artifact IO, morphology, alignment,
trajectory metrics, and the knn op."""

import pathlib

import numpy as np
import pytest

from vipe_tpu.ops.morph import dilate, erode
from vipe_tpu.priors.depth.alignment import (
    align_depth_to_depth,
    align_inv_depth_to_depth,
    apply_inv_depth_alignment,
)
from vipe_tpu.utils import io as io_utils
from vipe_tpu.utils.config import compose, get_config_path
from vipe_tpu.utils.geometry import (
    align_trajectories,
    ate_rmse,
    depth_abs_relative_difference,
    depth_delta1_accuracy,
    depth_rmse_log,
    matrix_to_se3,
    se3_to_matrix,
)


class TestConfig:
    def test_compose_defaults(self):
        cfg = compose(get_config_path(), "default")
        assert cfg["pipeline"]["slam"]["warmup"] == 8
        assert cfg["streams"]["instance"].endswith("RawMp4StreamList")

    def test_dotted_override(self):
        cfg = compose(get_config_path(), "default", ["pipeline.slam.warmup=3"])
        assert cfg["pipeline"]["slam"]["warmup"] == 3

    def test_neq_resolver(self):
        cfg = compose(get_config_path(), "default")
        assert cfg["pipeline"]["slam"]["optimize_intrinsics"] is True
        cfg = compose(get_config_path(), "default", ["pipeline.init.intrinsics=gt"])
        assert cfg["pipeline"]["slam"]["optimize_intrinsics"] is False


class TestArtifactIO:
    def test_pose_intrinsics_roundtrip(self, tmp_path, rng):
        art = io_utils.ArtifactPath(tmp_path, "clip")
        traj = rng.normal(size=(5, 7)).astype(np.float32)
        traj[:, 3:] /= np.linalg.norm(traj[:, 3:], axis=-1, keepdims=True)
        io_utils.save_poses(art, traj)
        io_utils.save_intrinsics(art, np.asarray([100.0, 100, 32, 24]), "pinhole", 5)
        mats, inds = io_utils.read_pose_artifacts(art)
        assert mats.shape == (5, 4, 4)
        np.testing.assert_allclose(mats, se3_to_matrix(traj), atol=1e-5)
        intr, ct = io_utils.read_intrinsics_artifacts(art)
        assert intr.shape == (5, 4) and ct == "pinhole"
        assert art.exists()
        assert io_utils.ArtifactPath.glob(tmp_path)[0].name == "clip"

    def test_depth_mask_roundtrip(self, tmp_path, rng):
        art = io_utils.ArtifactPath(tmp_path, "clip")
        depths = [rng.random((6, 8)).astype(np.float32) for _ in range(3)]
        io_utils.save_depth_zip(art, iter(depths))
        back = list(io_utils.read_depth_artifacts(art))
        assert len(back) == 3
        np.testing.assert_allclose(back[1], depths[1], atol=1e-2)

        masks = [(rng.random((6, 8)) * 3).astype(np.uint8) for _ in range(3)]
        io_utils.save_mask_zip(art, iter(masks), ["person", "dog"])
        back = list(io_utils.read_mask_artifacts(art))
        np.testing.assert_array_equal(back[2], masks[2])
        assert art.mask_phrase_path.read_text().splitlines() == ["person", "dog"]


class TestMorph:
    def test_dilate_erode(self):
        m = np.zeros((9, 9), bool)
        m[4, 4] = True
        d = dilate(m, 1)
        assert d.sum() == 9
        assert not erode(d, 1)[3, 3]
        assert erode(d, 1)[4, 4]
        e = erode(np.ones((9, 9), bool), 1)
        assert e[1:-1, 1:-1].all() and not e[0].any()


class TestAlignment:
    def test_inv_depth_alignment_recovers(self, rng):
        gt_depth = rng.uniform(1, 5, (32, 32))
        inv = (1.0 / gt_depth - 0.05) / 2.0  # gt_inv = 2*x + 0.05
        s, b = align_inv_depth_to_depth(inv, gt_depth)
        assert abs(s - 2.0) < 0.05 and abs(b - 0.05) < 0.01
        aligned = apply_inv_depth_alignment(inv, s, b)
        np.testing.assert_allclose(aligned, gt_depth, rtol=0.05)

    def test_depth_scale_alignment(self, rng):
        gt = rng.uniform(1, 5, (32, 32))
        assert abs(align_depth_to_depth(gt / 3.0, gt) - 3.0) < 0.05


class TestGeometryMetrics:
    def test_umeyama_alignment_exact(self, rng):
        import jax.numpy as jnp

        from vipe_tpu.ops import lie

        traj_gt = np.asarray(
            lie.se3_exp(jnp.asarray(rng.normal(size=(10, 6)) * 0.3, np.float32))
        )
        s, Rxi = 2.5, lie.se3_exp(jnp.asarray([0.3, -0.1, 0.2, 0.1, 0.2, -0.1]))
        sim = np.asarray(Rxi)
        pos = traj_gt[:, :3] * s
        pos = np.asarray(lie.se3_act(jnp.asarray(sim), jnp.asarray(pos)))
        traj = np.concatenate([pos, traj_gt[:, 3:]], -1)
        assert ate_rmse(traj, traj_gt, align=True) < 1e-4
        assert ate_rmse(traj, traj_gt, align=False) > 0.1

    def test_matrix_roundtrip(self, rng):
        import jax.numpy as jnp

        from vipe_tpu.ops import lie

        traj = np.asarray(
            lie.se3_exp(jnp.asarray(rng.normal(size=(6, 6)) * 0.4, np.float32))
        )
        back = matrix_to_se3(se3_to_matrix(traj))
        np.testing.assert_allclose(back[:, :3], traj[:, :3], atol=1e-5)

    def test_depth_metrics(self):
        gt = np.full((8, 8), 2.0)
        pred = np.full((8, 8), 2.2)
        assert abs(depth_abs_relative_difference(pred, gt) - 0.1) < 1e-6
        assert depth_delta1_accuracy(pred, gt) == 1.0
        assert depth_rmse_log(pred, gt) < 0.1
        assert depth_delta1_accuracy(gt * 1.3, gt) == 0.0


class TestKnn:
    def test_knn_exact(self, rng):
        import jax.numpy as jnp

        from vipe_tpu.ops.knn import knn

        pts = rng.normal(size=(200, 3)).astype(np.float32)
        q = rng.normal(size=(37, 3)).astype(np.float32)
        d2, idx = knn(jnp.asarray(q), jnp.asarray(pts), k=3, chunk=16)
        full = ((q[:, None] - pts[None]) ** 2).sum(-1)
        want_idx = np.argsort(full, axis=1)[:, :3]
        np.testing.assert_array_equal(np.sort(idx, 1), np.sort(want_idx, 1))
        np.testing.assert_allclose(
            np.sort(d2, 1), np.sort(np.take_along_axis(full, want_idx, 1), 1),
            atol=1e-4,
        )

    def test_knn_infill(self):
        from vipe_tpu.ops.knn import knn_infill_depth

        d = np.zeros((8, 8), np.float32)
        d[2, 2] = 1.5
        out = knn_infill_depth(d, max_dist_px=3.0)
        assert out[2, 3] == 1.5 and out[3, 3] == 1.5
        assert out[7, 7] == 0.0  # beyond max dist


class TestRectifyPane:
    def test_pinhole_identity_and_mei(self, rng):
        from vipe_tpu.utils.visualization import rectify_rgb

        rgb = (rng.random((16, 24, 3)) * 255).astype(np.uint8)
        pin = np.asarray([20.0, 20.0, 12.0, 8.0], np.float32)
        assert rectify_rgb(rgb, pin, "pinhole") is rgb
        mei = np.asarray([20.0, 20.0, 12.0, 8.0, 0.3], np.float32)
        out = rectify_rgb(rgb, mei, "mei")
        assert out.shape == rgb.shape and out.dtype == np.uint8
        # center ray is distortion-invariant → center pixel preserved
        assert abs(int(out[8, 12, 0]) - int(rgb[8, 12, 0])) <= 2


class TestTelemetry:
    def test_snapshot_roundtrip(self, tmp_path, rng):
        import jax.numpy as jnp

        from vipe_tpu.slam.buffer import GraphBuffer
        from vipe_tpu.utils.telemetry import TelemetryWriter, read_snapshot

        H, W = 16, 16
        ht, wd = H // 8, W // 8
        buf = GraphBuffer(height=H, width=W, buffer_size=8)
        z = jnp.zeros((ht, wd, 128), jnp.float32)
        for k in range(4):
            img = jnp.asarray(
                (rng.random((H, W, 3)) * 255).astype(np.uint8)
            )
            buf.append_keyframe(
                k, img, z, z, z,
                intrinsics=np.asarray([W, W, W / 2, H / 2], np.float32),
            )

        tele = TelemetryWriter(tmp_path, name="clip", every=2)
        assert tele.update(buf)
        assert not tele.update(buf)  # no new keyframes since
        assert tele.update(buf, force=True)

        snap = read_snapshot(tele.snapshot_path)
        assert int(snap["n_keyframes"]) == 4
        assert snap["poses_w2c"].shape == (4, 7)
        assert snap["cloud_xyz"].shape[0] == snap["cloud_rgb"].shape[0] > 0
        assert np.isfinite(snap["cloud_xyz"]).all()


class TestEvaluateCLI:
    def test_evaluate_command(self, tmp_path, rng):
        import json

        from click.testing import CliRunner

        from vipe_tpu.cli.main import vipe as vipe_cli
        from vipe_tpu.utils import io as io_utils

        for sub, noise in (("pred", 0.01), ("gt", 0.0)):
            art = io_utils.ArtifactPath(tmp_path / sub, "clip")
            traj = np.zeros((6, 7), np.float32)
            traj[:, 0] = np.arange(6) * 0.1 + noise * rng.normal(size=6)
            traj[:, 6] = 1.0
            io_utils.save_poses(art, traj)
            depths = [np.full((6, 8), 2.0 + noise, np.float32) for _ in range(3)]
            io_utils.save_depth_zip(art, iter(depths))

        r = CliRunner().invoke(
            vipe_cli,
            ["evaluate", str(tmp_path / "pred"), str(tmp_path / "gt")],
        )
        assert r.exit_code == 0, r.output
        res = json.loads(r.output)
        assert "clip" in res and res["clip"]["ate_rmse"] < 0.05
        assert res["clip"]["depth_abs_rel"] < 0.01
        assert res["clip"]["depth_delta1"] == 1.0

    def test_evaluate_in_tree_gt_and_save(self, tmp_path, rng):
        """GT read from the artifact tree's own eval/ paths (reference
        eval_gt_* layout) + --save writes metrics pickle and traj PNG."""
        import json
        import pickle
        import shutil

        from click.testing import CliRunner

        from vipe_tpu.cli.main import vipe as vipe_cli
        from vipe_tpu.utils import io as io_utils
        from vipe_tpu.utils.geometry import se3_to_matrix

        art = io_utils.ArtifactPath(tmp_path, "clip")
        traj = np.zeros((6, 7), np.float32)
        traj[:, 0] = np.arange(6) * 0.1 + 0.01 * rng.normal(size=6)
        traj[:, 6] = 1.0
        io_utils.save_poses(art, traj)
        io_utils.save_depth_zip(
            art, iter([np.full((6, 8), 2.01, np.float32)] * 3)
        )
        gt = traj.copy()
        gt[:, 0] = np.arange(6) * 0.1
        art.eval_gt_pose_path.parent.mkdir(parents=True, exist_ok=True)
        np.savez(art.eval_gt_pose_path, data=se3_to_matrix(gt))
        stage = io_utils.ArtifactPath(tmp_path / "stage", "clip")
        io_utils.save_depth_zip(
            stage, iter([np.full((6, 8), 2.0, np.float32)] * 3)
        )
        shutil.move(stage.depth_path, art.eval_gt_depth_path)

        r = CliRunner().invoke(vipe_cli, ["evaluate", str(tmp_path), "--save"])
        assert r.exit_code == 0, r.output
        res = json.loads(r.output)
        assert res["clip"]["ate_rmse"] < 0.05
        assert res["clip"]["depth_abs_rel"] < 0.01
        with open(art.eval_metrics_path, "rb") as f:
            assert pickle.load(f)["ate_rmse"] == res["clip"]["ate_rmse"]
        assert art.eval_traj_vis_path.exists()


class TestBufferCopyAppend:
    def test_copy_rows_inplace(self, rng):
        import jax.numpy as jnp

        from vipe_tpu.utils import jaxutil

        a = jnp.asarray(rng.random((6, 4, 3)).astype(np.float32))
        ref = np.asarray(a)
        out = jaxutil.copy_rows(a, 1, 4, 2)
        exp = ref.copy()
        exp[4:6] = ref[1:3]
        np.testing.assert_array_equal(np.asarray(out), exp)

    def test_append_keyframe_copy_matches_append(self, rng):
        """Pass-2 copy-append must reproduce exactly what re-encoding the
        same frame would have written (same image → same encoder outputs)."""
        import jax.numpy as jnp

        from vipe_tpu.slam.buffer import GraphBuffer

        H, W = 16, 16
        ht, wd = H // 8, W // 8
        buf = GraphBuffer(height=H, width=W, buffer_size=8)
        img = jnp.asarray((rng.random((H, W, 3)) * 255).astype(np.uint8))
        fmap = jnp.asarray(rng.random((ht, wd, 128)).astype(np.float32))
        net = jnp.asarray(rng.random((ht, wd, 128)).astype(np.float32))
        inp = jnp.asarray(rng.random((ht, wd, 128)).astype(np.float32))
        mask = jnp.asarray(rng.random((ht, wd)) > 0.5)
        depth = np.full((H, W), 2.0, np.float32)
        buf.append_keyframe(0, img, fmap, net, inp, mask=mask,
                            metric_depth=depth)
        # the reference append (what pass 2 would produce by re-encoding)
        buf.append_keyframe(5, img, fmap, net, inp, mask=mask,
                            metric_depth=depth)
        # the copy append
        buf.append_keyframe_copy(0, 5)
        assert buf.n_frames == 3
        assert buf.tstamp[2] == 5
        for name in ("images", "fmaps", "nets", "inps", "masks",
                     "disps_sens"):
            arr = np.asarray(getattr(buf, name))
            np.testing.assert_array_equal(arr[2], arr[1], err_msg=name)

    def test_append_none_context_skips_write(self, rng):
        import jax.numpy as jnp

        from vipe_tpu.slam.buffer import GraphBuffer

        H, W = 16, 16
        ht, wd = H // 8, W // 8
        buf = GraphBuffer(height=H, width=W, buffer_size=8)
        img = jnp.zeros((H, W, 3), jnp.uint8)
        fmap = jnp.ones((ht, wd, 128), jnp.float32)
        buf.append_keyframe(0, img, fmap, None, None)
        assert buf.n_frames == 1
        np.testing.assert_array_equal(
            np.asarray(buf.fmaps[0]), np.ones((ht, wd, 128), np.float32)
        )
        # context rows untouched (stay zero-initialized)
        assert float(jnp.abs(buf.nets[0]).sum()) == 0.0
