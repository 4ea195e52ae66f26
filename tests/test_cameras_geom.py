"""Tests for camera models and projective geometry (oracle: round-trips,
autodiff consistency, and dense numpy reference implementations).

Reference semantics: /root/reference/vipe/utils/cameras.py and
/root/reference/csrc/slam_ext/geom_kernels.cu (frame_distance, depth_filter).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vipe_tpu.ops import cameras as cam
from vipe_tpu.ops import geom, lie


PINHOLE = cam.CameraType.PINHOLE
MEI = cam.CameraType.MEI
PANO = cam.CameraType.PANORAMA


class TestCameraModels:
    def test_pinhole_roundtrip(self, rng):
        intr = jnp.asarray([100.0, 110.0, 32.0, 24.0])
        u = jnp.asarray(rng.uniform(0, 64, (50,)), jnp.float32)
        v = jnp.asarray(rng.uniform(0, 48, (50,)), jnp.float32)
        disp = jnp.asarray(rng.uniform(0.2, 2.0, (50,)), jnp.float32)
        pts = cam.iproj_disp(PINHOLE, intr, u, v, disp)
        # scale homogeneous points to actual 3D then project
        coords = cam.proj_points(PINHOLE, intr, pts)
        np.testing.assert_allclose(coords[..., 0], u, atol=1e-3)
        np.testing.assert_allclose(coords[..., 1], v, atol=1e-3)

    def test_mei_roundtrip(self, rng):
        intr = jnp.asarray([100.0, 100.0, 32.0, 24.0, 0.8])
        u = jnp.asarray(rng.uniform(5, 60, (50,)), jnp.float32)
        v = jnp.asarray(rng.uniform(5, 43, (50,)), jnp.float32)
        disp = jnp.asarray(rng.uniform(0.2, 2.0, (50,)), jnp.float32)
        pts = cam.iproj_disp(MEI, intr, u, v, disp)
        coords = cam.proj_points(MEI, intr, pts)
        np.testing.assert_allclose(coords[..., 0], u, atol=1e-2)
        np.testing.assert_allclose(coords[..., 1], v, atol=1e-2)

    def test_mei_reduces_to_pinhole_at_k1_zero(self, rng):
        intr5 = jnp.asarray([100.0, 110.0, 32.0, 24.0, 0.0])
        intr4 = intr5[:4]
        u = jnp.asarray(rng.uniform(0, 64, (20,)), jnp.float32)
        v = jnp.asarray(rng.uniform(0, 48, (20,)), jnp.float32)
        disp = jnp.ones((20,), jnp.float32)
        p5 = cam.iproj_disp(MEI, intr5, u, v, disp)
        p4 = cam.iproj_disp(PINHOLE, intr4, u, v, disp)
        np.testing.assert_allclose(p5, p4, atol=1e-5)

    def test_panorama_roundtrip(self, rng):
        # pixel-unit equirect parameterization for a 64×48 grid
        intr = cam.panorama_intrinsics(48, 64)
        u = jnp.asarray(rng.uniform(0.05, 0.95, (50,)) * 64, jnp.float32)
        v = jnp.asarray(rng.uniform(0.05, 0.95, (50,)) * 48, jnp.float32)
        disp = jnp.ones((50,), jnp.float32)
        pts = cam.iproj_disp(PANO, intr, u, v, disp)
        # rays are unit length
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(pts[..., :3]), axis=-1), 1.0, atol=1e-5
        )
        coords = cam.proj_points(PANO, intr, pts)
        np.testing.assert_allclose(coords[..., 0], u, atol=1e-3)
        np.testing.assert_allclose(coords[..., 1], v, atol=1e-3)

    def test_pinhole_equivalent_mei_center_slope(self):
        intr = jnp.asarray([100.0, 100.0, 32.0, 24.0, 0.5])
        pin = cam.pinhole_equivalent(MEI, intr)
        assert pin.shape[-1] == 4
        np.testing.assert_allclose(pin[:2], 100.0 / 1.5, atol=1e-5)

    def test_proj_differentiable(self):
        intr = jnp.asarray([100.0, 100.0, 32.0, 24.0])
        pts = jnp.asarray([0.3, -0.2, 2.0, 0.5])
        J = jax.jacfwd(lambda p: cam.proj_points(PINHOLE, intr, p))(pts)
        # dZ column: -f X / Z^2
        np.testing.assert_allclose(J[0, 2], -100.0 * 0.3 / 4.0, atol=1e-4)
        np.testing.assert_allclose(J[0, 3], 0.0, atol=1e-6)


def make_scene(rng, n=6, ht=12, wd=16):
    """Random consistent scene: poses + disparities of a fronto plane-ish."""
    intr = jnp.asarray([wd * 1.2, wd * 1.2, wd / 2.0, ht / 2.0])
    xi = jnp.asarray(rng.normal(size=(n, 6)) * 0.02, jnp.float32)
    xi = xi.at[:, :3].multiply(3.0)  # small rotations, modest translations
    poses = lie.se3_exp(xi)
    disps = jnp.asarray(0.5 + 0.1 * rng.random((n, ht, wd)), jnp.float32)
    return poses, disps, intr


class TestGeom:
    def test_reproject_identity(self, rng):
        poses, disps, intr = make_scene(rng)
        ii = jnp.asarray([0, 1])
        jj = jnp.asarray([0, 1])  # self edges → coords == grid
        coords, valid = geom.reproject(
            poses, disps, intr, PINHOLE, ii, jj
        )
        ht, wd = disps.shape[-2:]
        u, v = geom.pixel_grid(ht, wd)
        np.testing.assert_allclose(coords[..., 0], np.broadcast_to(u, coords.shape[:-1]), atol=1e-4)
        np.testing.assert_allclose(coords[..., 1], np.broadcast_to(v, coords.shape[:-1]), atol=1e-4)
        assert bool(jnp.all(valid))

    def test_reproject_translation_shift(self):
        """Pure x-translation of the camera shifts image content by -fx*t*disp."""
        ht, wd = 12, 16
        intr = jnp.asarray([20.0, 20.0, 8.0, 6.0])
        poses = jnp.stack([lie.se3_identity(), lie.se3_exp(jnp.asarray([0.1, 0, 0, 0, 0, 0.0]))])
        disps = jnp.full((2, ht, wd), 0.5)
        coords, _ = geom.reproject(poses, disps, intr, PINHOLE,
                                   jnp.asarray([0]), jnp.asarray([1]))
        u, v = geom.pixel_grid(ht, wd)
        # x_j = x_i + fx * t_x * disp (homog: X + t*d over Z=1)
        np.testing.assert_allclose(coords[0, ..., 0], u + 20.0 * 0.1 * 0.5, atol=1e-4)
        np.testing.assert_allclose(coords[0, ..., 1], v, atol=1e-4)

    def test_frame_distance_zero_for_identical(self, rng):
        poses, disps, intr = make_scene(rng)
        poses = jnp.broadcast_to(lie.se3_identity(), poses.shape)
        d = geom.frame_distance(poses, disps, intr, jnp.asarray([0]), jnp.asarray([1]))
        np.testing.assert_allclose(d, 0.0, atol=1e-4)

    def test_frame_distance_monotone_in_translation(self):
        ht, wd = 12, 16
        intr = jnp.asarray([20.0, 20.0, 8.0, 6.0])
        disps = jnp.full((3, ht, wd), 0.5)
        p0 = lie.se3_identity()
        p1 = lie.se3_exp(jnp.asarray([0.1, 0, 0, 0, 0, 0.0]))
        p2 = lie.se3_exp(jnp.asarray([0.4, 0, 0, 0, 0, 0.0]))
        poses = jnp.stack([p0, p1, p2])
        d = geom.frame_distance(poses, disps, intr,
                                jnp.asarray([0, 0]), jnp.asarray([1, 2]))
        assert float(d[0]) < float(d[1])
        np.testing.assert_allclose(float(d[0]), 20.0 * 0.1 * 0.5, atol=0.05)

    def test_frame_distance_saturates_when_behind(self):
        """Direction whose points land behind the target → <75% valid → 1000.

        frame_distance is single-direction (geom_kernels.cu:587 loops once);
        here 0→1 stays in front (z' = 1 + 5·d > 0) while 1→0 pushes all
        points behind the camera (z' = 1 − 5·d < 0) and must saturate."""
        ht, wd = 12, 16
        intr = jnp.asarray([20.0, 20.0, 8.0, 6.0])
        disps = jnp.full((2, ht, wd), 2.0)  # depth 0.5, easily behind
        p0 = lie.se3_identity()
        p1 = lie.se3_exp(jnp.asarray([0.0, 0, 5.0, 0, 0, 0.0]))  # push far forward
        poses = jnp.stack([p0, p1])
        d_fwd = geom.frame_distance(
            poses, disps, intr, jnp.asarray([0]), jnp.asarray([1])
        )
        d_rev = geom.frame_distance(
            poses, disps, intr, jnp.asarray([1]), jnp.asarray([0])
        )
        assert float(d_fwd[0]) < 1000.0
        assert float(d_rev[0]) == 1000.0

    def test_depth_filter_consistent_scene(self, rng):
        """A geometrically consistent scene gets high counts; a corrupted frame's
        pixels get low counts."""
        ht, wd = 16, 20
        intr = jnp.asarray([24.0, 24.0, 10.0, 8.0])
        n = 6
        # camera moving in x, looking at plane z=2 → disp = 0.5 everywhere
        ts = jnp.linspace(0, 0.3, n)
        poses = jax.vmap(lambda t: lie.se3_exp(jnp.asarray([t, 0, 0, 0, 0, 0.0])))(ts)
        # disp field consistent with a fronto-parallel plane at depth 2 for ALL
        # cameras (translation along x does not change depth)
        disps = jnp.full((n, ht, wd), 0.5)
        counter = geom.depth_filter(
            poses, disps, intr, jnp.arange(n), jnp.full((n,), 0.1)
        )
        # middle frames have 6 neighbors mostly agreeing (borders clip)
        center = counter[2:4, 4:-4, 4:-4]
        assert float(jnp.mean(center)) > 3.0

        disps_bad = disps.at[3].multiply(3.0)
        counter_bad = geom.depth_filter(
            poses, disps_bad, intr, jnp.arange(n), jnp.full((n,), 0.1)
        )
        assert float(jnp.mean(counter_bad[3, 4:-4, 4:-4])) < 1.0

    def test_bilinear_sample_matches_manual(self, rng):
        img = jnp.asarray(rng.random((8, 10)), jnp.float32)
        coords = jnp.asarray([[2.5, 3.5]])
        out = geom.bilinear_sample(img, coords)
        manual = 0.25 * (img[3, 2] + img[3, 3] + img[4, 2] + img[4, 3])
        np.testing.assert_allclose(out[0], manual, atol=1e-6)

    def test_induced_flow_zero_at_identity(self, rng):
        poses, disps, intr = make_scene(rng)
        poses = jnp.broadcast_to(lie.se3_identity(), poses.shape)
        flow, valid = geom.induced_flow(poses, disps, intr, PINHOLE,
                                        jnp.asarray([0]), jnp.asarray([1]))
        np.testing.assert_allclose(flow, 0.0, atol=1e-4)
