"""Metric3D (flax) shape, canonical-space, and checkpoint-structure tests."""

import numpy as np
import pytest

from vipe_tpu.priors.depth.base import DepthEstimationInput, DepthType
from vipe_tpu.priors.depth.metric3d import (
    METRIC3D_CFGS,
    Metric3DModel,
    Metric3DNet,
)


class TestMetric3D:
    def test_net_shapes(self):
        import jax.numpy as jnp

        net = Metric3DNet("small", iters=2)
        depth, normals, conf = net(jnp.zeros((1, 70, 84, 3)))
        # ~1/4-res field (⌊patch·7/2⌋) convex-upsampled ×4; the adapter
        # resizes to the exact input size
        assert depth.shape == (1, 68, 84)
        assert normals.shape == (1, 68, 84, 4)  # xyz + kappa
        assert conf.shape == (1, 68, 84)
        assert float(depth.min()) >= 0.1 and float(depth.max()) <= 200.0
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(normals[..., :3]), axis=-1), 1.0,
            atol=1e-4)

    def test_adapter_focal_scaling(self, rng):
        """METRIC_DEPTH semantics: output scales linearly with focal."""
        m = Metric3DModel("small", input_size=(70, 84), iters=2)
        rgb = rng.random((60, 90, 3)).astype(np.float32)
        d1 = np.asarray(m.estimate(DepthEstimationInput(rgb, 50.0)).depth)
        d2 = np.asarray(m.estimate(DepthEstimationInput(rgb, 100.0)).depth)
        assert d1.shape == (60, 90)
        np.testing.assert_allclose(d2, 2.0 * d1, rtol=1e-5)
        assert m.depth_type == DepthType.METRIC_DEPTH


def make_synthetic_metric3d_sd(rng, variant: str = "small") -> dict:
    """Reference-shaped state_dict for the DINOv2-reg backbone + the
    RAFTDepthNormalDPT5 decode head (module tree mirrored from
    RAFTDepthNormalDPTDecoder5.py:393-1325)."""
    cfg = METRIC3D_CFGS[variant]
    D = cfg["D"]
    depth_blocks = 12 if variant == "small" else 24
    fc = cfg["feature_channels"]
    dc = cfg["decoder_channels"]
    h = cfg["hidden"]
    R = 4
    sd = {}

    def add(key, shape):
        sd[key] = rng.normal(size=shape).astype(np.float32) * 0.02

    # ----- encoder (DINOv2-reg) -----
    e = "depth_model.encoder"
    add(f"{e}.patch_embed.proj.weight", (D, 3, 14, 14))
    add(f"{e}.patch_embed.proj.bias", (D,))
    add(f"{e}.cls_token", (1, 1, D))
    add(f"{e}.register_tokens", (1, R, D))
    add(f"{e}.pos_embed", (1, 37 * 37 + 1, D))
    add(f"{e}.norm.weight", (D,))
    add(f"{e}.norm.bias", (D,))
    for i in range(depth_blocks):
        b = f"{e}.blocks.{i}"
        add(f"{b}.norm1.weight", (D,)); add(f"{b}.norm1.bias", (D,))
        add(f"{b}.attn.qkv.weight", (3 * D, D)); add(f"{b}.attn.qkv.bias", (3 * D,))
        add(f"{b}.attn.proj.weight", (D, D)); add(f"{b}.attn.proj.bias", (D,))
        add(f"{b}.ls1.gamma", (D,)); add(f"{b}.ls2.gamma", (D,))
        add(f"{b}.norm2.weight", (D,)); add(f"{b}.norm2.bias", (D,))
        add(f"{b}.mlp.fc1.weight", (4 * D, D)); add(f"{b}.mlp.fc1.bias", (4 * D,))
        add(f"{b}.mlp.fc2.weight", (D, 4 * D)); add(f"{b}.mlp.fc2.bias", (D,))

    # ----- decode head -----
    d = "depth_model.decoder"
    for i in range(4):
        base = f"{d}.token2feature.read_{i}"
        add(f"{base}.readoper.project_patch.weight", (D, D))
        add(f"{base}.readoper.project_patch.bias", (D,))
        add(f"{base}.readoper.project_learn.weight", (D, (1 + R) * D))
    add(f"{d}.token2feature.read_1.sample.weight", (D, fc[1], 2, 2))
    add(f"{d}.token2feature.read_1.sample.bias", (fc[1],))
    add(f"{d}.token2feature.read_0.sample.0.weight", (fc[0], D, 1, 1))
    add(f"{d}.token2feature.read_0.sample.0.bias", (fc[0],))

    def conv_block(base, ch):
        add(f"{base}.conv1.weight", (ch, ch, 3, 3))
        add(f"{base}.conv1.bias", (ch,))
        add(f"{base}.conv2.weight", (ch, ch, 3, 3))
        add(f"{base}.conv2.bias", (ch,))

    # upconv_3: FuseBlock(dc[4] -> dc[3], fuse=False)
    conv_block(f"{d}.decoder_mono.upconv_3.way_trunk", dc[4])
    add(f"{d}.decoder_mono.upconv_3.out_conv.weight", (dc[3], dc[4], 1, 1))
    add(f"{d}.decoder_mono.upconv_3.out_conv.bias", (dc[3],))
    # upconv_2: FuseBlock(dc[3] -> dc[2])
    conv_block(f"{d}.decoder_mono.upconv_2.way_trunk", dc[3])
    conv_block(f"{d}.decoder_mono.upconv_2.way_branch", dc[3])
    add(f"{d}.decoder_mono.upconv_2.out_conv.weight", (dc[2], dc[3], 1, 1))
    add(f"{d}.decoder_mono.upconv_2.out_conv.bias", (dc[2],))
    # upconv_1: FuseBlock(dc[2] -> dc[1] + 2)
    conv_block(f"{d}.decoder_mono.upconv_1.way_trunk", dc[2])
    conv_block(f"{d}.decoder_mono.upconv_1.way_branch", dc[2])
    add(f"{d}.decoder_mono.upconv_1.out_conv.weight", (dc[1] + 2, dc[2], 1, 1))
    add(f"{d}.decoder_mono.upconv_1.out_conv.bias", (dc[1] + 2,))

    add(f"{d}.depth_regressor.0.weight", (256, dc[1], 3, 3))
    add(f"{d}.depth_regressor.0.bias", (256,))
    add(f"{d}.depth_regressor.2.weight", (256, 256, 1, 1))
    add(f"{d}.depth_regressor.2.bias", (256,))
    np_dims = [(128, dc[1], 3, 3), (128, 128, 1, 1), (128, 128, 1, 1),
               (3, 128, 1, 1)]
    for k, shp in zip((0, 2, 4, 6), np_dims):
        add(f"{d}.normal_predictor.{k}.weight", shp)
        add(f"{d}.normal_predictor.{k}.bias", (shp[0],))

    # context encoder: ResidualBlock('layer') + conv, ×2 outputs per scale
    ctx_in = (fc[0], fc[1], D)
    for tag, cin in zip(("04", "08", "16"), ctx_in):
        for j in (0, 1):
            base = f"{d}.context_feature_encoder.outputs{tag}.{j}"
            add(f"{base}.0.conv1.weight", (h, cin, 3, 3))
            add(f"{base}.0.conv1.bias", (h,))
            add(f"{base}.0.norm1.weight", (h,)); add(f"{base}.0.norm1.bias", (h,))
            add(f"{base}.0.conv2.weight", (h, h, 3, 3))
            add(f"{base}.0.conv2.bias", (h,))
            add(f"{base}.0.norm2.weight", (h,)); add(f"{base}.0.norm2.bias", (h,))
            if cin != h:
                add(f"{base}.0.downsample.0.weight", (h, cin, 1, 1))
                add(f"{base}.0.downsample.0.bias", (h,))
                add(f"{base}.0.norm3.weight", (h,))
                add(f"{base}.0.norm3.bias", (h,))
            add(f"{base}.1.weight", (h, h, 3, 3))
            add(f"{base}.1.bias", (h,))
    for lvl in range(3):
        add(f"{d}.context_zqr_convs.{lvl}.weight", (3 * h, h, 3, 3))
        add(f"{d}.context_zqr_convs.{lvl}.bias", (3 * h,))

    # update block
    ub = f"{d}.update_block"
    gru_in = {"gru08": 6 + h, "gru16": h + h, "gru32": h}
    for g, cin in gru_in.items():
        for c in ("convz", "convr", "convq"):
            add(f"{ub}.{g}.{c}.weight", (h, h + cin, 3, 3))
            add(f"{ub}.{g}.{c}.bias", (h,))
    add(f"{ub}.flow_head.conv1d.weight", (h, h, 3, 3))
    add(f"{ub}.flow_head.conv1d.bias", (h,))
    add(f"{ub}.flow_head.conv2d.weight", (2, h, 3, 3))
    add(f"{ub}.flow_head.conv2d.bias", (2,))
    add(f"{ub}.flow_head.conv1n.weight", (h, h, 3, 3))
    add(f"{ub}.flow_head.conv1n.bias", (h,))
    add(f"{ub}.flow_head.conv2n.weight", (4, h, 3, 3))
    add(f"{ub}.flow_head.conv2n.bias", (4,))
    add(f"{ub}.mask.0.weight", (h, h, 3, 3))
    add(f"{ub}.mask.0.bias", (h,))
    add(f"{ub}.mask.2.weight", (4 * 4 * 9, h, 1, 1))
    add(f"{ub}.mask.2.bias", (4 * 4 * 9,))
    return sd


class TestMetric3DConverter:
    def test_synthetic_state_dict_tree_parity(self, rng):
        """The converted checkpoint tree must match a fresh init key-by-key,
        and the converted net must run (decoder fidelity vs reference
        RAFTDepthNormalDPTDecoder5)."""
        import jax
        import jax.numpy as jnp

        from vipe_tpu.models import convert as mconvert

        sd = make_synthetic_metric3d_sd(rng, "small")
        converted = mconvert.convert_metric3d(sd)
        fresh = Metric3DNet("small", iters=1)
        fi = {jax.tree_util.keystr(p): v.shape
              for p, v in jax.tree_util.tree_leaves_with_path(fresh.params)}
        ci = {jax.tree_util.keystr(p): np.shape(v)
              for p, v in jax.tree_util.tree_leaves_with_path(converted)}
        assert fi == ci, (
            sorted(set(fi) - set(ci))[:5], sorted(set(ci) - set(fi))[:5]
        )

        net = Metric3DNet("small", params=converted, iters=1)
        depth, normals, conf = net(
            jnp.asarray(rng.random((1, 70, 84, 3)), jnp.float32)
        )
        assert depth.shape == (1, 68, 84)
        assert np.isfinite(np.asarray(depth)).all()
