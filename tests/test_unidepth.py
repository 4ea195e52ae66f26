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
        # tiny pixel bounds keep the infer() resize level near the test size
        m = UniDepthModel("s", pixels_min=3_000, pixels_max=6_000)
        assert m.depth_type == DepthType.MODEL_METRIC_DEPTH
        out = m.estimate(DepthEstimationInput(
            rgb=rng.random((60, 80, 3)).astype(np.float32), focal_length=70.0,
        ))
        assert out.depth.shape == (60, 80)
        assert out.confidence.shape == (60, 80)
        assert bool(jnp.isfinite(out.depth).all())

    def test_adapter_batch_matches_single(self, rng):
        """estimate_depth_batch (one stacked uint8-in/f16-out forward) must
        match per-frame estimate_depth, and stay close to the f32
        reference-exact estimate() path — the pad-raw-with-mean-then-
        normalize-on-device reorder is exactly equivalent up to the single
        0.5/255 uint8 quantization (random weights amplify it)."""
        m = UniDepthModel("s", pixels_min=3_000, pixels_max=6_000)
        rgbs = [rng.random((60, 80, 3)).astype(np.float32) for _ in range(3)]
        batched = m.estimate_depth_batch(rgbs, 70.0)
        for r, d in zip(rgbs, batched):
            single = np.asarray(m.estimate_depth(r, 70.0))
            # 2e-2: the production path computes in bf16 (batch-order
            # accumulation differs between K=1 and K=4 buckets at bf16's
            # ~8e-3 relative resolution)
            np.testing.assert_allclose(
                np.asarray(d), single, rtol=2e-2, atol=2e-2
            )
            ref = np.asarray(m.estimate(DepthEstimationInput(
                rgb=r, focal_length=70.0)).depth)
            scale = np.abs(ref).max() + 1e-9
            assert np.abs(np.asarray(d) - ref).max() / scale < 0.08


class TestSensDevice:
    def test_estimate_sens_device_matches_host_path(self, rng):
        """The device-resident keyframe-depth program (uint8 buffer image →
        policy resize → net → /8 disparity prior, zero host transfers) must
        match the host estimate_depth path + [3::8,3::8] sampling — the
        only differences are cv2-vs-XLA bilinear epsilon and the uint8
        re-quantization the host path pays."""
        import jax.numpy as jnp

        m = UniDepthModel("s", pixels_min=3_000, pixels_max=6_000)
        H, W = 64, 80
        rgb = rng.random((H, W, 3)).astype(np.float32)
        img_u8 = jnp.asarray(
            np.rint(rgb * 255.0).astype(np.uint8)
        )
        intr = jnp.asarray([70.0, 70.0, W / 2, H / 2], jnp.float32)
        sens_dev = np.asarray(m.estimate_sens_device(img_u8, intr))
        assert sens_dev.shape == (H // 8, W // 8)

        depth_host = np.asarray(m.estimate_depth(rgb, 70.0))
        d = depth_host[3::8, 3::8]
        sens_host = np.where(d > 0, 1.0 / np.maximum(d, 1e-8), d)
        scale = np.abs(sens_host).max() + 1e-9
        assert np.abs(sens_dev - sens_host).max() / scale < 0.08
        # no-intrinsics branch (predicted camera) also runs
        sens_nocam = np.asarray(m.estimate_sens_device(img_u8, None))
        assert np.isfinite(sens_nocam).all()


def make_synthetic_unidepth_sd(rng, D=384, hidden=512, depths=(2, 2, 2),
                               n_levels=4, vit_depth=12):
    """Reference-shaped UniDepthV2 state_dict (pixel_encoder DINOv2 +
    pixel_decoder, models/unidepthv2/decoder.py module tree)."""
    sd = {}

    def add(key, shape):
        sd[key] = rng.normal(size=shape).astype(np.float32) * 0.02

    e = "pixel_encoder"
    add(f"{e}.patch_embed.proj.weight", (D, 3, 14, 14))
    add(f"{e}.patch_embed.proj.bias", (D,))
    add(f"{e}.cls_token", (1, 1, D))
    add(f"{e}.pos_embed", (1, 37 * 37 + 1, D))
    add(f"{e}.norm.weight", (D,)); add(f"{e}.norm.bias", (D,))
    for i in range(vit_depth):
        b = f"{e}.blocks.{i}"
        add(f"{b}.norm1.weight", (D,)); add(f"{b}.norm1.bias", (D,))
        add(f"{b}.attn.qkv.weight", (3 * D, D))
        add(f"{b}.attn.qkv.bias", (3 * D,))
        add(f"{b}.attn.proj.weight", (D, D)); add(f"{b}.attn.proj.bias", (D,))
        add(f"{b}.ls1.gamma", (D,)); add(f"{b}.ls2.gamma", (D,))
        add(f"{b}.norm2.weight", (D,)); add(f"{b}.norm2.bias", (D,))
        add(f"{b}.mlp.fc1.weight", (4 * D, D)); add(f"{b}.mlp.fc1.bias", (4 * D,))
        add(f"{b}.mlp.fc2.weight", (D, 4 * D)); add(f"{b}.mlp.fc2.bias", (D,))

    d = "pixel_decoder"
    for i in range(n_levels):
        add(f"{d}.input_adapter.input_adapters.{i}.weight", (hidden, D))
        add(f"{d}.input_adapter.input_adapters.{i}.bias", (hidden,))
        add(f"{d}.camera_token_adapter.input_adapters.{i}.weight", (hidden, D))
        add(f"{d}.camera_token_adapter.input_adapters.{i}.bias", (hidden,))

    def mlp(base, dim, expansion, out):
        hid = dim * expansion
        add(f"{base}.norm.weight", (dim,)); add(f"{base}.norm.bias", (dim,))
        add(f"{base}.proj1.weight", (hid, dim)); add(f"{base}.proj1.bias", (hid,))
        add(f"{base}.proj2.weight", (out, hid)); add(f"{base}.proj2.bias", (out,))

    def attn(base, dim, bias=True, ls=True):
        add(f"{base}.norm_attnx.weight", (dim,))
        add(f"{base}.norm_attnx.bias", (dim,))
        add(f"{base}.norm_attnctx.weight", (dim,))
        add(f"{base}.norm_attnctx.bias", (dim,))
        add(f"{base}.kv.weight", (2 * dim, dim))
        add(f"{base}.q.weight", (dim, dim))
        add(f"{base}.out.weight", (dim, dim))
        if bias:
            add(f"{base}.kv.bias", (2 * dim,))
            add(f"{base}.q.bias", (dim,))
            add(f"{base}.out.bias", (dim,))
        if ls:
            add(f"{base}.ls1.gamma", (dim,)); add(f"{base}.ls2.gamma", (dim,))
        mlp(f"{base}.mlp", dim, 4, dim)

    cl = f"{d}.camera_layer"
    add(f"{cl}.latents_pos", (1, 4, hidden))
    mlp(f"{cl}.project", hidden, 1, hidden)
    attn(f"{cl}.aggregate1", hidden, bias=False)
    attn(f"{cl}.aggregate2", hidden, bias=False)
    mlp(f"{cl}.out_pinhole", hidden, 1, 1)

    dl = f"{d}.depth_layer"
    add(f"{dl}.to_latents.weight", (hidden, hidden))
    add(f"{dl}.to_latents.bias", (hidden,))
    for lvl in range(n_levels):
        attn(f"{dl}.prompt_camera.{lvl}.layers.0", hidden, bias=False,
             ls=False)
    mult = 2
    for i, dep in enumerate(depths):
        cur = min(hidden, mult * hidden // (2 ** i))
        nxt = mult * hidden // (2 ** (i + 1))
        out = max(nxt, 32)
        k = max(1, 2 * i)
        add(f"{dl}.process_features.{i}.weight", (hidden, cur, k, k))
        add(f"{dl}.process_features.{i}.bias", (cur,))
        for j in range(dep):
            add(f"{dl}.ups.{i}.convs.{j}.conv1.weight", (cur, cur, 7, 7))
            add(f"{dl}.ups.{i}.convs.{j}.conv1.bias", (cur,))
            add(f"{dl}.ups.{i}.convs.{j}.conv2.weight", (cur, cur, 7, 7))
            add(f"{dl}.ups.{i}.convs.{j}.conv2.bias", (cur,))
            add(f"{dl}.ups.{i}.convs.{j}.gamma", (1, cur, 1, 1))
        add(f"{dl}.ups.{i}.up.0.weight", (out, cur, 1, 1))
        add(f"{dl}.ups.{i}.up.0.bias", (out,))
    last = len(depths) - 1
    nd = max(mult * hidden // (2 ** len(depths)), 32)
    add(f"{dl}.depth_mlp.{last}.0.weight", (nd,))
    add(f"{dl}.depth_mlp.{last}.0.bias", (nd,))
    add(f"{dl}.depth_mlp.{last}.1.weight", (nd, nd))
    add(f"{dl}.depth_mlp.{last}.1.bias", (nd,))
    add(f"{dl}.confidence_mlp.0.weight", (nd,))
    add(f"{dl}.confidence_mlp.0.bias", (nd,))
    add(f"{dl}.confidence_mlp.1.weight", (nd, nd))
    add(f"{dl}.confidence_mlp.1.bias", (nd,))
    add(f"{dl}.to_depth_lr.weight", (nd // 2, nd, 3, 3))
    add(f"{dl}.to_depth_lr.bias", (nd // 2,))
    add(f"{dl}.to_depth_hr.0.weight", (32, nd // 2, 3, 3))
    add(f"{dl}.to_depth_hr.0.bias", (32,))
    add(f"{dl}.to_depth_hr.2.weight", (1, 32, 1, 1))
    add(f"{dl}.to_depth_hr.2.bias", (1,))
    add(f"{dl}.to_confidence_lr.weight", (nd // 2, nd, 3, 3))
    add(f"{dl}.to_confidence_lr.bias", (nd // 2,))
    add(f"{dl}.to_confidence_hr.0.weight", (32, nd // 2, 3, 3))
    add(f"{dl}.to_confidence_hr.0.bias", (32,))
    add(f"{dl}.to_confidence_hr.2.weight", (1, 32, 1, 1))
    add(f"{dl}.to_confidence_hr.2.bias", (1,))
    return sd


class TestUniDepthConverter:
    def test_synthetic_state_dict_tree_parity(self, rng):
        import jax

        from vipe_tpu.models import convert as mconvert

        sd = make_synthetic_unidepth_sd(rng)
        converted = mconvert.convert_unidepth(sd)
        fresh = UniDepthNet("vits")
        fi = {jax.tree_util.keystr(p): v.shape
              for p, v in jax.tree_util.tree_leaves_with_path(fresh.params)}
        ci = {jax.tree_util.keystr(p): np.shape(v)
              for p, v in jax.tree_util.tree_leaves_with_path(converted)}
        assert fi == ci, (
            sorted(set(fi) - set(ci))[:6], sorted(set(ci) - set(fi))[:6]
        )

        net = UniDepthNet("vits", params=converted)
        out = net(jnp.asarray(rng.random((1, 70, 84, 3)), jnp.float32))
        assert out["depth"].shape == (1, 70, 84)
        assert np.isfinite(np.asarray(out["depth"])).all()
