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
        """At the principal point the latitude equals the pitch angle.
        Principal point convention is c = (w/2, h/2) on an INTEGER pixel
        grid (reference camera.py:308-322) — even dims put it on a pixel."""
        for pitch in (0.0, 0.2, -0.35):
            lat = latitude_field(16, 20, 25.0, 0.1, pitch)
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


def make_synthetic_geocalib_sd(rng):
    """Reference-shaped GeoCalib checkpoint (geocalib.py:105-133 module tree:
    MSCAN backbone + ll_enc + perspective_decoder heads)."""
    sd = {}

    def add(key, shape):
        sd[key] = rng.normal(size=shape).astype(np.float32) * 0.02

    def add_bn(key, c):
        add(f"{key}.weight", (c,)); add(f"{key}.bias", (c,))
        sd[f"{key}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{key}.running_var"] = np.ones(c, np.float32)

    dims, depths, ratios = (64, 128, 320, 512), (3, 3, 12, 3), (8, 8, 4, 4)
    bb = "backbone"
    add(f"{bb}.patch_embed1.proj.0.weight", (32, 3, 3, 3))
    add(f"{bb}.patch_embed1.proj.0.bias", (32,))
    add_bn(f"{bb}.patch_embed1.proj.1", 32)
    add(f"{bb}.patch_embed1.proj.3.weight", (64, 32, 3, 3))
    add(f"{bb}.patch_embed1.proj.3.bias", (64,))
    add_bn(f"{bb}.patch_embed1.proj.4", 64)
    for i, (d, dep, mr) in enumerate(zip(dims, depths, ratios)):
        if i > 0:
            add(f"{bb}.patch_embed{i + 1}.proj.weight", (d, dims[i - 1], 3, 3))
            add(f"{bb}.patch_embed{i + 1}.proj.bias", (d,))
            add_bn(f"{bb}.patch_embed{i + 1}.norm", d)
        for j in range(dep):
            b = f"{bb}.block{i + 1}.{j}"
            add_bn(f"{b}.norm1", d); add_bn(f"{b}.norm2", d)
            add(f"{b}.layer_scale_1", (d,)); add(f"{b}.layer_scale_2", (d,))
            add(f"{b}.attn.proj_1.weight", (d, d, 1, 1))
            add(f"{b}.attn.proj_1.bias", (d,))
            add(f"{b}.attn.proj_2.weight", (d, d, 1, 1))
            add(f"{b}.attn.proj_2.bias", (d,))
            sg = f"{b}.attn.spatial_gating_unit"
            for nm, kk in (("conv0", (5, 5)), ("conv0_1", (1, 7)),
                           ("conv0_2", (7, 1)), ("conv1_1", (1, 11)),
                           ("conv1_2", (11, 1)), ("conv2_1", (1, 21)),
                           ("conv2_2", (21, 1)), ("conv3", (1, 1))):
                cin = d if nm == "conv3" else 1
                add(f"{sg}.{nm}.weight", (d, cin) + kk)
                add(f"{sg}.{nm}.bias", (d,))
            hid = int(d * mr)
            add(f"{b}.mlp.fc1.weight", (hid, d, 1, 1))
            add(f"{b}.mlp.fc1.bias", (hid,))
            add(f"{b}.mlp.dwconv.dwconv.weight", (hid, 1, 3, 3))
            add(f"{b}.mlp.dwconv.dwconv.bias", (hid,))
            add(f"{b}.mlp.fc2.weight", (d, hid, 1, 1))
            add(f"{b}.mlp.fc2.bias", (d,))
        add(f"{bb}.norm{i + 1}.weight", (d,))
        add(f"{bb}.norm{i + 1}.bias", (d,))

    add("ll_enc.conv1.conv.weight", (64, 3, 3, 3))
    add("ll_enc.conv1.conv.bias", (64,))
    add("ll_enc.conv2.conv.weight", (64, 64, 3, 3))
    add("ll_enc.conv2.conv.bias", (64,))

    def ham_head(prefix):
        add(f"{prefix}.squeeze.conv.weight", (512, sum(dims), 1, 1))
        add(f"{prefix}.squeeze.conv.bias", (512,))
        add(f"{prefix}.hamburger.ham_in.conv.weight", (512, 512, 1, 1))
        add(f"{prefix}.hamburger.ham_in.conv.bias", (512,))
        add(f"{prefix}.hamburger.ham_out.conv.weight", (512, 512, 1, 1))
        add(f"{prefix}.hamburger.ham_out.conv.bias", (512,))
        add(f"{prefix}.align.conv.weight", (64, 512, 1, 1))
        add(f"{prefix}.align.conv.bias", (64,))
        add(f"{prefix}.out_conv.conv.weight", (64, 64, 3, 3))
        for u in (1, 2):
            add(f"{prefix}.ll_fusion.resConfUnit{u}.conv1.weight", (64, 64, 3, 3))
            add(f"{prefix}.ll_fusion.resConfUnit{u}.conv1.bias", (64,))
            add(f"{prefix}.ll_fusion.resConfUnit{u}.conv2.weight", (64, 64, 3, 3))
            add(f"{prefix}.ll_fusion.resConfUnit{u}.conv2.bias", (64,))
        add(f"{prefix}.linear_pred_uncertainty.0.conv.weight", (64, 64, 3, 3))
        add(f"{prefix}.linear_pred_uncertainty.1.weight", (1, 64, 1, 1))
        add(f"{prefix}.linear_pred_uncertainty.1.bias", (1,))

    pd = "perspective_decoder"
    ham_head(f"{pd}.up_head.decoder")
    add(f"{pd}.up_head.linear_pred_up.weight", (2, 64, 1, 1))
    add(f"{pd}.up_head.linear_pred_up.bias", (2,))
    ham_head(f"{pd}.latitude_head.decoder")
    add(f"{pd}.latitude_head.linear_pred_latitude.weight", (1, 64, 1, 1))
    add(f"{pd}.latitude_head.linear_pred_latitude.bias", (1,))
    return sd


class TestGeoCalibConverter:
    def test_synthetic_state_dict_tree_parity(self, rng):
        import jax
        import jax.numpy as jnp

        from vipe_tpu.models import convert as mconvert
        from vipe_tpu.priors.geocalib import GeoCalib

        sd = make_synthetic_geocalib_sd(rng)
        converted = mconvert.convert_geocalib(sd)
        fresh = GeoCalib("pinhole", infer_size=64)
        fi = {jax.tree_util.keystr(p): v.shape
              for p, v in jax.tree_util.tree_leaves_with_path(fresh.params)}
        ci = {jax.tree_util.keystr(p): np.shape(v)
              for p, v in jax.tree_util.tree_leaves_with_path(converted)}
        assert fi == ci, (
            sorted(set(fi) - set(ci))[:6], sorted(set(ci) - set(fi))[:6]
        )

        model = GeoCalib("pinhole", params=converted, infer_size=64)
        fields = model.predict_fields(rng.random((64, 96, 3)).astype(np.float32))
        assert fields["up_field"].shape[-1] == 2
        assert np.isfinite(fields["latitude_field"]).all()
