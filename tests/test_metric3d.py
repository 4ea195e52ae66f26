"""Metric3D (flax) shape + canonical-space tests."""

import numpy as np
import pytest

from vipe_tpu.priors.depth.base import DepthEstimationInput, DepthType
from vipe_tpu.priors.depth.metric3d import Metric3DModel, Metric3DNet


class TestMetric3D:
    def test_net_shapes(self):
        import jax.numpy as jnp

        net = Metric3DNet("small", iters=2)
        depth, normals, prob = net(jnp.zeros((1, 70, 84, 3)))
        # decoder works at ~2/7 of the patch grid upsampled chain
        assert depth.ndim == 3 and depth.shape[0] == 1
        assert normals.shape[:3] == depth.shape and normals.shape[-1] == 3
        assert float(depth.min()) >= 0.1 and float(depth.max()) <= 200.0
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(normals), axis=-1), 1.0, atol=1e-4)

    def test_adapter_focal_scaling(self, rng):
        """METRIC_DEPTH semantics: output scales linearly with focal."""
        m = Metric3DModel("small", input_size=(70, 84))
        m.net.decoder = m.net.decoder.replace(iters=2) if hasattr(
            m.net.decoder, "replace") else m.net.decoder
        rgb = rng.random((60, 90, 3)).astype(np.float32)
        d1 = np.asarray(m.estimate(DepthEstimationInput(rgb, 50.0)).depth)
        d2 = np.asarray(m.estimate(DepthEstimationInput(rgb, 100.0)).depth)
        assert d1.shape == (60, 90)
        np.testing.assert_allclose(d2, 2.0 * d1, rtol=1e-5)
        assert m.depth_type == DepthType.METRIC_DEPTH
