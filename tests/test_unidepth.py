"""UniDepth v2 (flax) shape/behavior tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from vipe_tpu.priors.depth.base import DepthEstimationInput, DepthType
from vipe_tpu.priors.depth.unidepth import UniDepthModel, UniDepthNet


@pytest.fixture(scope="module")
def net():
    return UniDepthNet("vits")


class TestUniDepth:
    def test_forward_predicted_camera(self, net):
        out = net(jnp.zeros((1, 70, 84, 3)))
        assert out["depth"].shape == (1, 70, 84)
        assert out["points"].shape == (1, 70, 84, 3)
        assert out["intrinsics"].shape == (1, 4)
        assert float(jnp.min(out["depth"])) > 0  # exp(log radius) > 0
        # predicted principal point lands inside the image
        cx, cy = float(out["intrinsics"][0, 2]), float(out["intrinsics"][0, 3])
        assert 0 < cx < 84 and 0 < cy < 70

    def test_forward_given_rays(self, net, rng):
        x = jnp.asarray(rng.random((1, 70, 84, 3)), jnp.float32)
        u, v = np.meshgrid(np.arange(84) + 0.5, np.arange(70) + 0.5)
        f = 80.0
        rays = np.stack([(u - 42) / f, (v - 35) / f, np.ones_like(u)], -1)
        rays = rays / np.linalg.norm(rays, axis=-1, keepdims=True)
        out = net(x, jnp.asarray(rays, jnp.float32)[None])
        # the given rays pass through verbatim
        np.testing.assert_allclose(np.asarray(out["rays"][0]), rays, atol=1e-5)
        # depth = z of rays·radius → differs from radius off-center
        r = np.linalg.norm(np.asarray(out["points"][0]), axis=-1)
        d = np.asarray(out["depth"][0])
        assert (d[0, 0] < r[0, 0]) and abs(d[35, 42] - r[35, 42]) < 1e-3

    def test_focal_changes_output(self, net, rng):
        """Camera conditioning must actually influence the depth."""
        x = jnp.asarray(rng.random((1, 70, 84, 3)), jnp.float32)

        def rays_for(f):
            u, v = np.meshgrid(np.arange(84) + 0.5, np.arange(70) + 0.5)
            r = np.stack([(u - 42) / f, (v - 35) / f, np.ones_like(u)], -1)
            return jnp.asarray(
                r / np.linalg.norm(r, axis=-1, keepdims=True), jnp.float32
            )[None]

        d1 = np.asarray(net(x, rays_for(50.0))["depth"])
        d2 = np.asarray(net(x, rays_for(150.0))["depth"])
        assert float(np.mean(np.abs(d1 - d2))) > 1e-4

    def test_adapter(self, rng):
        m = UniDepthModel("s", input_size=70)
        assert m.depth_type == DepthType.MODEL_METRIC_DEPTH
        out = m.estimate(DepthEstimationInput(
            rgb=rng.random((60, 80, 3)).astype(np.float32), focal_length=70.0,
        ))
        assert out.depth.shape == (60, 80)
        assert out.confidence.shape == (60, 80)
        assert bool(jnp.isfinite(out.depth).all())
