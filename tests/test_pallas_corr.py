"""Interpret-mode parity for the Pallas fused pyramid-lookup kernel
(vipe_tpu/ops/pallas_corr.py) against the XLA selection-matrix path
(ops/corr.py) — same bilinear window semantics, out-of-bounds taps zero.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vipe_tpu.ops import corr
from vipe_tpu.ops.pallas_corr import (
    corr_fused_pallas,
    corr_lookup_pyramid_pallas,
)


def _fmaps_and_coords(rng, E=2, H=16, W=24, C=32):
    f1 = jnp.asarray(rng.standard_normal((E, H, W, C)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((E, H, W, C)), jnp.float32)
    u = rng.uniform(-2.0, W + 2.0, (E, H, W))
    v = rng.uniform(-2.0, H + 2.0, (E, H, W))
    coords = jnp.asarray(np.stack([u, v], -1), jnp.float32)
    return f1, f2, coords


def _pyramid_and_coords(rng, E=2, H=16, W=24, C=32, spread=1.0):
    f1, f2, coords = _fmaps_and_coords(rng, E, H, W, C)
    pyr = corr.corr_pyramid(f1, f2)
    return pyr, coords * spread


class TestPallasLookup:
    def test_matches_xla_path(self, rng):
        pyr, coords = _pyramid_and_coords(rng)
        ref = corr.corr_lookup_pyramid(pyr, coords)
        out = corr_lookup_pyramid_pallas(pyr, coords, interpret=True)
        assert out.shape == ref.shape
        # bf16 volumes; XLA path accumulates the row contraction in bf16,
        # the kernel in f32 — tolerance covers that rounding difference
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=0, atol=2e-2
        )

    def test_int8_scales_match_dequantized(self, rng):
        """int8 quantized volumes + per-edge scales (corr_dtype='int8'):
        the kernel dequantizes in VMEM, the scale folds in outside — must
        match the XLA lookup of the explicitly dequantized volumes."""
        pyr, coords = _pyramid_and_coords(rng)
        qs = [corr.quantize_volume(p) for p in pyr]
        deq = [
            (q.astype(jnp.float32)
             * s[:, None, None, None, None]).astype(jnp.bfloat16)
            for q, s in qs
        ]
        ref = corr.corr_lookup_pyramid(deq, coords)
        out = corr_lookup_pyramid_pallas(
            [q for q, _ in qs], coords, interpret=True,
            scales=tuple(s for _, s in qs),
        )
        scale = np.abs(np.asarray(ref)).max() + 1e-9
        assert np.abs(np.asarray(out) - np.asarray(ref)).max() / scale < 2e-2

    def test_out_of_bounds_taps_are_zero(self, rng):
        pyr, _ = _pyramid_and_coords(rng)
        E, H, W = pyr[0].shape[:3]
        far = jnp.full((E, H, W, 2), -100.0, jnp.float32)
        out = corr_lookup_pyramid_pallas(pyr, far, interpret=True)
        np.testing.assert_array_equal(np.asarray(out), 0.0)

    def test_row_block_fallback_for_odd_heights(self, rng):
        # H=6 not divisible by 8: kernel falls back to 1-row blocks
        pyr, coords = _pyramid_and_coords(rng, H=6, W=8)
        ref = corr.corr_lookup_pyramid(pyr, coords)
        out = corr_lookup_pyramid_pallas(pyr, coords, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=0, atol=2e-2
        )

    def test_fused_altcorr_matches_materialized_path(self, rng):
        """corr_fused_pallas (volume built in VMEM, never materialized)
        must match corr_pyramid → corr_lookup_pyramid to bf16 rounding."""
        f1, f2, coords = _fmaps_and_coords(rng)
        ref = corr.corr_lookup_pyramid(corr.corr_pyramid(f1, f2), coords)
        pools = [f2]
        for _ in range(3):
            pools.append(corr.avg_pool2_nhwc(pools[-1]))
        out = corr_fused_pallas(f1, pools, coords, interpret=True)
        assert out.shape == ref.shape
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=0, atol=2e-2
        )

    def test_fused_altcorr_out_of_bounds_zero(self, rng):
        f1, f2, _ = _fmaps_and_coords(rng)
        E, H, W = f1.shape[:3]
        pools = [f2]
        for _ in range(3):
            pools.append(corr.avg_pool2_nhwc(pools[-1]))
        far = jnp.full((E, H, W, 2), 500.0, jnp.float32)
        out = corr_fused_pallas(f1, pools, far, interpret=True)
        np.testing.assert_array_equal(np.asarray(out), 0.0)

    def test_packed_features_xla_path_matches(self, rng):
        """corr_feat_pack + corr_lookup_pyramid (packed, XLA alt path —
        no Pallas gate) must match the materialized-volume path."""
        f1, f2, coords = _fmaps_and_coords(rng)
        ref = corr.corr_lookup_pyramid(corr.corr_pyramid(f1, f2), coords)
        packed = corr.corr_feat_pack(f1, f2)
        assert all(p.ndim == 4 for p in packed)
        out = corr.corr_lookup_pyramid(packed, coords)
        assert out.shape == ref.shape
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=0, atol=2e-2
        )

    def test_env_gate_routes_through_pallas(self, rng, monkeypatch):
        pyr, coords = _pyramid_and_coords(rng, H=8, W=8)
        ref = corr.corr_lookup_pyramid(pyr, coords)
        called = {}
        import vipe_tpu.ops.pallas_corr as pc

        orig = pc.corr_lookup_pyramid_pallas

        def spy(p, c, radius=3, **kw):
            called["yes"] = True
            return orig(p, c, radius=radius, interpret=True)

        monkeypatch.setattr(pc, "corr_lookup_pyramid_pallas", spy)
        monkeypatch.setattr(corr, "_USE_PALLAS", True)
        out = corr.corr_lookup_pyramid(pyr, coords)
        assert called.get("yes")
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=0, atol=2e-2
        )
