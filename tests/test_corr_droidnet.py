"""Correlation ops vs naive oracles + DroidNet shape/conversion tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vipe_tpu.models import convert as mconvert
from vipe_tpu.models import droidnet
from vipe_tpu.ops import corr


def naive_corr_lookup(vol, coords, radius):
    """Straightforward numpy oracle: bilinear sample at coords+offset."""
    E, h1, w1, h2, w2 = vol.shape
    k = 2 * radius + 1
    out = np.zeros((E, h1, w1, k * k), np.float32)
    vol = np.asarray(vol)
    coords = np.asarray(coords)
    for e in range(E):
        for y in range(h1):
            for x in range(w1):
                u, v = coords[e, y, x]
                for i, dy in enumerate(range(-radius, radius + 1)):
                    for j, dx in enumerate(range(-radius, radius + 1)):
                        uu, vv = u + dx, v + dy
                        u0, v0 = int(np.floor(uu)), int(np.floor(vv))
                        du, dv = uu - u0, vv - v0
                        acc = 0.0
                        for (a, b, w) in [
                            (0, 0, (1 - dv) * (1 - du)),
                            (0, 1, (1 - dv) * du),
                            (1, 0, dv * (1 - du)),
                            (1, 1, dv * du),
                        ]:
                            yy, xx = v0 + a, u0 + b
                            if 0 <= yy < h2 and 0 <= xx < w2:
                                acc += w * vol[e, y, x, yy, xx]
                        out[e, y, x, i * k + j] = acc
    return out


class TestCorr:
    def test_lookup_matches_naive(self, rng):
        E, h, w = 2, 5, 6
        vol = jnp.asarray(rng.random((E, h, w, h, w)), jnp.float32)
        coords = jnp.asarray(rng.uniform(-1, max(h, w), (E, h, w, 2)), jnp.float32)
        got = corr.corr_lookup(vol, coords, radius=2)
        want = naive_corr_lookup(vol, coords, radius=2)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_volume_matches_dot(self, rng):
        E, h, w, c = 2, 4, 5, 8
        f1 = jnp.asarray(rng.random((E, h, w, c)), jnp.float32)
        f2 = jnp.asarray(rng.random((E, h, w, c)), jnp.float32)
        vol = corr.corr_volume(f1, f2)
        want = np.einsum("eyxc,ezwc->eyxzw", np.asarray(f1), np.asarray(f2)) / 16.0
        np.testing.assert_allclose(vol, want, atol=2e-3, rtol=1e-3)  # bf16 volume

    def test_alt_corr_matches_volume_path(self, rng):
        """altcorr at level 0 == materialized volume lookup."""
        E, h, w, c = 2, 6, 8, 16
        f1 = jnp.asarray(rng.random((E, h, w, c)), jnp.float32)
        f2 = jnp.asarray(rng.random((E, h, w, c)), jnp.float32)
        coords = jnp.asarray(rng.uniform(0, 5, (E, h, w, 2)), jnp.float32)
        vol = corr.corr_volume(f1, f2)
        want = corr.corr_lookup(vol, coords, radius=3)
        got = corr.alt_corr_lookup_level(f1 / 4.0, f2 / 4.0, coords, radius=3)
        np.testing.assert_allclose(got, want, atol=2e-3)  # bf16 volume path

    def test_pyramid_matches_volume_pooling(self, rng):
        """The pooled-target-features pyramid must equal pooling the
        materialized volume over the target dims (linearity of avg-pool in
        fmap2 — the reference's CorrBlock form, droid_net.py:67-69)."""
        E, h, w, c = 2, 8, 8, 16
        f1 = jnp.asarray(rng.random((E, h, w, c)), jnp.float32)
        f2 = jnp.asarray(rng.random((E, h, w, c)), jnp.float32)
        pyr = corr.corr_pyramid(f1, f2, num_levels=3)
        want = np.einsum(
            "eyxc,ezwc->eyxzw", np.asarray(f1), np.asarray(f2)
        ) / 16.0
        for lvl in range(3):
            np.testing.assert_allclose(
                np.asarray(pyr[lvl], np.float32), want,
                atol=3e-2, rtol=2e-2,  # bf16 features + bf16 volumes
            )
            e_, h1, w1, h2, w2 = want.shape
            want = want.reshape(e_, h1, w1, h2 // 2, 2, w2 // 2, 2).mean(
                axis=(4, 6)
            )

    def test_pyramid_levels_shapes(self, rng):
        E, h, w, c = 1, 8, 16, 4
        f1 = jnp.asarray(rng.random((E, h, w, c)), jnp.float32)
        pyr = corr.corr_pyramid(f1, f1, num_levels=3)
        assert pyr[0].shape == (E, h, w, h, w)
        assert pyr[1].shape == (E, h, w, h // 2, w // 2)
        assert pyr[2].shape == (E, h, w, h // 4, w // 4)
        out = corr.corr_lookup_pyramid(pyr, jnp.zeros((E, h, w, 2)), radius=3)
        assert out.shape == (E, h, w, 3 * 49)


class TestDroidNet:
    def test_shapes_and_init(self):
        ht, wd = 6, 8
        model, params = droidnet.init_droidnet(jax.random.PRNGKey(0), ht, wd)
        imgs = jnp.zeros((2, ht * 8, wd * 8, 3))
        fmap = model.apply(params, imgs, method=model.encode_features)
        assert fmap.shape == (2, ht, wd, 128)
        net, inp = model.apply(params, imgs, method=model.encode_context)
        assert net.shape == (2, ht, wd, 128) and inp.shape == (2, ht, wd, 128)
        assert float(jnp.max(jnp.abs(net))) <= 1.0
        assert float(jnp.min(inp)) >= 0.0

        E = 3
        corr_feat = jnp.zeros((E, ht, wd, droidnet.CORR_PLANES))
        flow = jnp.zeros((E, ht, wd, 4))
        ix = jnp.asarray([0, 0, 1], jnp.int32)
        net_e = jnp.zeros((E, ht, wd, 128))
        inp_e = jnp.zeros((E, ht, wd, 128))
        net2, delta, weight, eta = model.apply(
            params, net_e, inp_e, corr_feat, flow, ix, 2,
            method=lambda m, *a: m.update(*a),
        )
        assert net2.shape == (E, ht, wd, 128)
        assert delta.shape == (E, ht, wd, 2)
        assert weight.shape == (E, ht, wd, 2)
        assert eta.shape == (2, ht, wd)
        assert float(jnp.min(weight)) >= 0.0 and float(jnp.max(weight)) <= 1.0
        assert float(jnp.min(eta)) >= 0.0

    def test_checkpoint_conversion_roundtrip(self, rng):
        """Synthetic torch-style state_dict converts into the exact param tree."""
        ht, wd = 6, 8
        model, params = droidnet.init_droidnet(jax.random.PRNGKey(0), ht, wd)

        sd = {}

        def add_conv(key, kshape):
            sd[key + ".weight"] = rng.normal(size=kshape).astype(np.float32) * 0.01
            sd[key + ".bias"] = rng.normal(size=kshape[0]).astype(np.float32) * 0.01

        for pre, od in (("fnet", 128), ("cnet", 256)):
            add_conv(f"{pre}.conv1", (32, 3, 7, 7))
            dims = [(32, 32), (64, 32), (128, 64)]
            for stage, (dout, din) in enumerate(dims, start=1):
                add_conv(f"{pre}.layer{stage}.0.conv1", (dout, din, 3, 3))
                add_conv(f"{pre}.layer{stage}.0.conv2", (dout, dout, 3, 3))
                if stage > 1:
                    add_conv(f"{pre}.layer{stage}.0.downsample.0", (dout, din, 1, 1))
                add_conv(f"{pre}.layer{stage}.1.conv1", (dout, dout, 3, 3))
                add_conv(f"{pre}.layer{stage}.1.conv2", (dout, dout, 3, 3))
            add_conv(f"{pre}.conv2", (od, 128, 1, 1))

        add_conv("update.corr_encoder.0", (128, 196, 1, 1))
        add_conv("update.corr_encoder.2", (128, 128, 3, 3))
        add_conv("update.flow_encoder.0", (128, 4, 7, 7))
        add_conv("update.flow_encoder.2", (64, 128, 3, 3))
        add_conv("update.weight.0", (128, 128, 3, 3))
        add_conv("update.weight.2", (3, 128, 3, 3))  # 3-ch ckpt, sliced to 2
        add_conv("update.delta.0", (128, 128, 3, 3))
        add_conv("update.delta.2", (3, 128, 3, 3))
        for n in ("convz", "convr", "convq"):
            add_conv(f"update.gru.{n}", (128, 448, 3, 3))
            add_conv(f"update.gru.{n}_glo", (128, 128, 1, 1))
        add_conv("update.gru.w", (128, 128, 1, 1))
        add_conv("update.agg.conv1", (128, 128, 3, 3))
        add_conv("update.agg.conv2", (128, 128, 3, 3))
        add_conv("update.agg.eta.0", (1, 128, 3, 3))

        converted = mconvert.convert_droidnet(sd)

        # identical tree structure and leaf shapes as a fresh init
        flat_init = jax.tree_util.tree_leaves_with_path(params)
        flat_conv = jax.tree_util.tree_leaves_with_path(converted)
        paths_i = {jax.tree_util.keystr(p): v.shape for p, v in flat_init}
        paths_c = {jax.tree_util.keystr(p): v.shape for p, v in flat_conv}
        assert paths_i == paths_c

        # converted params run
        imgs = jnp.zeros((1, ht * 8, wd * 8, 3))
        fmap = model.apply(converted, imgs, method=model.encode_features)
        assert fmap.shape == (1, ht, wd, 128)
        assert np.all(np.isfinite(np.asarray(fmap)))
