"""GeoCalib perspective fields + LM optimizer tests (synthetic recovery)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vipe_tpu.priors.geocalib import (
    calibrate_from_fields,
    gravity_from_rp,
    latitude_field,
    rp_from_gravity,
    up_field,
)


class TestFields:
    def test_gravity_roundtrip(self, rng):
        roll = rng.uniform(-0.5, 0.5, 8).astype(np.float32)
        pitch = rng.uniform(-0.5, 0.5, 8).astype(np.float32)
        g = gravity_from_rp(jnp.asarray(roll), jnp.asarray(pitch))
        np.testing.assert_allclose(np.linalg.norm(np.asarray(g), axis=-1), 1.0,
                                   atol=1e-6)
        r2, p2 = rp_from_gravity(g)
        np.testing.assert_allclose(r2, roll, atol=1e-5)
        np.testing.assert_allclose(p2, pitch, atol=1e-5)

    def test_upright_camera_up_field(self):
        """Zero roll/pitch → up field points straight up (−y in image)."""
        up = up_field(16, 20, 20.0, 0.0, 0.0)
        np.testing.assert_allclose(np.asarray(up[..., 1]), -1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(up[..., 0]), 0.0, atol=1e-5)

    def test_rolled_camera_up_field(self):
        """Pure roll rotates the up field by the roll angle at the center."""
        roll = 0.3
        up = up_field(17, 21, 20.0, roll, 0.0)
        c = np.asarray(up[8, 10])  # principal point: pure rotation
        # reference roll sign convention: x component = −sin(roll)
        expected = np.array([-np.sin(roll), -np.cos(roll)])
        np.testing.assert_allclose(c, expected, atol=1e-4)

    def test_latitude_center_equals_pitch(self):
        """At the principal point the latitude equals the pitch angle."""
        for pitch in (0.0, 0.2, -0.35):
            lat = latitude_field(17, 21, 25.0, 0.1, pitch)
            np.testing.assert_allclose(float(lat[8, 10]), pitch, atol=1e-4)

    def test_latitude_range(self):
        lat = latitude_field(16, 20, 10.0, 0.0, 0.0)
        assert float(jnp.max(jnp.abs(lat))) < np.pi / 2


class TestLMOptimizer:
    def test_recovers_focal_and_gravity(self, rng):
        h, w = 24, 32
        focal_gt, roll_gt, pitch_gt = 40.0, 0.25, -0.15
        up_gt = up_field(h, w, focal_gt, roll_gt, pitch_gt)
        lat_gt = latitude_field(h, w, focal_gt, roll_gt, pitch_gt)
        res = calibrate_from_fields(up_gt, lat_gt, focal_init=float(w))
        assert abs(float(res.focal) - focal_gt) / focal_gt < 0.02, res
        assert abs(float(res.roll[0]) - roll_gt) < 0.01
        assert abs(float(res.pitch[0]) - pitch_gt) < 0.01

    def test_robust_to_noise_and_confidence(self, rng):
        h, w = 24, 32
        focal_gt, roll_gt, pitch_gt = 36.0, -0.1, 0.2
        up_gt = np.asarray(up_field(h, w, focal_gt, roll_gt, pitch_gt))
        lat_gt = np.asarray(latitude_field(h, w, focal_gt, roll_gt, pitch_gt))
        # corrupt a corner region, mark it low-confidence
        up_noisy = up_gt.copy()
        up_noisy[:8, :8] = rng.normal(size=(8, 8, 2))
        lat_noisy = lat_gt.copy()
        lat_noisy[:8, :8] = rng.normal(size=(8, 8))
        conf = np.ones((h, w), np.float32)
        conf[:8, :8] = 0.0
        res = calibrate_from_fields(
            up_noisy, lat_noisy, up_conf=conf[None], lat_conf=conf[None],
            focal_init=float(w),
        )
        assert abs(float(res.focal) - focal_gt) / focal_gt < 0.05
        assert abs(float(res.roll[0]) - roll_gt) < 0.02

    def test_shared_intrinsics_multi_frame(self, rng):
        """3 frames, one focal, three gravities (the pipeline's setup)."""
        h, w = 20, 24
        focal_gt = 30.0
        rolls = [0.1, -0.2, 0.3]
        pitches = [-0.1, 0.15, 0.05]
        ups = np.stack([
            np.asarray(up_field(h, w, focal_gt, r, p))
            for r, p in zip(rolls, pitches)
        ])
        lats = np.stack([
            np.asarray(latitude_field(h, w, focal_gt, r, p))
            for r, p in zip(rolls, pitches)
        ])
        res = calibrate_from_fields(ups, lats, focal_init=float(w))
        assert abs(float(res.focal) - focal_gt) / focal_gt < 0.02
        for b in range(3):
            assert abs(float(res.roll[b]) - rolls[b]) < 0.01
            assert abs(float(res.pitch[b]) - pitches[b]) < 0.01


class TestDistortedLM:
    @pytest.mark.parametrize("model,k1_gt", [
        ("simple_radial", 0.08),
        ("simple_divisional", -0.12),
        ("simple_mei", 0.35),
    ])
    def test_recovers_k1_nonsquare(self, model, k1_gt):
        """Synthetic-field recovery with k1 ≠ 0 on a NON-SQUARE grid
        (reference lm_optimizer.py:519-609 distorted path)."""
        h, w = 24, 40
        focal_gt, roll_gt, pitch_gt = 36.0, 0.15, -0.1
        up_gt = up_field(h, w, focal_gt, roll_gt, pitch_gt,
                         k1=k1_gt, model=model)
        lat_gt = latitude_field(h, w, focal_gt, roll_gt, pitch_gt,
                                k1=k1_gt, model=model)
        res = calibrate_from_fields(
            up_gt, lat_gt, focal_init=float(w), model=model,
        )
        assert abs(float(res.focal) - focal_gt) / focal_gt < 0.05, res
        assert abs(float(res.k1) - k1_gt) < 0.05, res
        assert abs(float(res.roll[0]) - roll_gt) < 0.02
        assert abs(float(res.pitch[0]) - pitch_gt) < 0.02

    def test_distortion_roundtrip(self):
        """undistort(distort_scale·uv) = uv for every model."""
        from vipe_tpu.priors.geocalib.fields import (
            distort_scale,
            normalized_grid,
            undistort,
        )

        uv = np.asarray(normalized_grid(12, 16, 20.0))
        for model, k1 in (("simple_radial", 0.1),
                          ("simple_divisional", -0.15),
                          ("simple_mei", 0.4)):
            s = np.asarray(distort_scale(model, uv, k1))
            back = np.asarray(undistort(model, uv * s, k1))
            np.testing.assert_allclose(back, uv, atol=2e-4, err_msg=model)


class TestGeoCalibNet:
    def test_forward_shapes(self, rng):
        from vipe_tpu.priors.geocalib import GeoCalib

        g = GeoCalib(infer_size=64)
        # aspect-preserving short-side resize: 48×72 → 64×96, /32 crop → 64×96
        fields = g.predict_fields(rng.random((48, 72, 3)).astype(np.float32))
        assert fields["up_field"].shape == (64, 96, 2)
        assert fields["latitude_field"].shape == (64, 96)
        np.testing.assert_allclose(
            np.linalg.norm(fields["up_field"], axis=-1), 1.0, atol=1e-4)
        assert np.abs(fields["latitude_field"]).max() <= np.pi / 2 + 1e-5
        assert 0 <= fields["up_confidence"].min() <= fields["up_confidence"].max() <= 1

    def test_calibrate_api(self, rng):
        from vipe_tpu.priors.geocalib import GeoCalib

        g = GeoCalib(infer_size=64)
        frames = [rng.random((48, 72, 3)).astype(np.float32) for _ in range(3)]
        intr = g.calibrate(frames)
        assert intr.shape == (4,)
        assert intr[2] == 36.0 and intr[3] == 24.0
        assert np.isfinite(intr).all() and intr[0] > 0
