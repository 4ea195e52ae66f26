"""DepthAnythingV2 (flax DINOv2 + DPT) shape and conversion tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vipe_tpu.models import convert as mconvert
from vipe_tpu.models.dpt import DPTHead
from vipe_tpu.models.vit import make_vit
from vipe_tpu.priors.depth.base import DepthType
from vipe_tpu.priors.depth.dav2 import DAV2_CONFIGS, DepthAnythingV2Model, DepthAnythingV2Net, preprocess


class TestViT:
    def test_tap_shapes(self):
        vit = make_vit("vits")
        x = jnp.zeros((1, 70, 98, 3))  # 5x7 patches
        params = vit.init(jax.random.PRNGKey(0), x, tap_layers=(2, 5, 8, 11))
        taps = vit.apply(params, x, tap_layers=(2, 5, 8, 11))
        assert len(taps) == 4
        tok, cls = taps[0]
        assert tok.shape == (1, 35, 384)
        assert cls.shape == (1, 384)

    def test_pos_embed_interpolation(self):
        """Different input sizes share params (pos embed resized)."""
        vit = make_vit("vits")
        x1 = jnp.zeros((1, 70, 98, 3))
        params = vit.init(jax.random.PRNGKey(0), x1, tap_layers=(11,))
        out1 = vit.apply(params, x1, tap_layers=(11,))
        x2 = jnp.zeros((1, 140, 140, 3))
        out2 = vit.apply(params, x2, tap_layers=(11,))
        assert out2[0][0].shape == (1, 100, 384)
        assert np.isfinite(np.asarray(out1[0][0])).all()


class TestDAv2:
    def test_forward_shapes_relative(self):
        net = DepthAnythingV2Net("vits", max_depth=None)
        x = jnp.zeros((1, 70, 98, 3))
        out = net(x)
        assert out.shape == (1, 70, 98)
        assert float(jnp.min(out)) >= 0.0  # relu disparity

    def test_forward_shapes_metric(self):
        net = DepthAnythingV2Net("vits", max_depth=20.0)
        out = net(jnp.zeros((1, 70, 98, 3)))
        assert out.shape == (1, 70, 98)
        assert 0.0 <= float(jnp.max(out)) <= 20.0

    def test_preprocess_lower_bound(self, rng):
        img, (h, w) = preprocess(rng.random((100, 200, 3)).astype(np.float32),
                                 input_size=140)
        assert (h, w) == (100, 200)
        assert img.shape[0] % 14 == 0 and img.shape[1] % 14 == 0
        assert min(img.shape[:2]) >= 140 - 14

    def test_adapter_estimate(self, rng):
        model = DepthAnythingV2Model("vits", ckpt="default", input_size=70)
        assert model.depth_type == DepthType.AFFINE_DISP
        out = model.estimate_depth(rng.random((60, 80, 3)).astype(np.float32))
        assert out.shape == (60, 80)

    def test_checkpoint_conversion_structure(self, rng):
        """Synthetic torch state_dict converts to the exact flax tree."""
        sd = make_synthetic_dav2_sd(rng)
        converted = mconvert.convert_dav2(sd)
        net = DepthAnythingV2Net("vits", max_depth=None, params=converted)
        out = net(jnp.asarray(rng.random((1, 70, 98, 3)), jnp.float32))
        assert out.shape == (1, 70, 98)
        assert np.isfinite(np.asarray(out)).all()

        # structural identity with a fresh init
        fresh = DepthAnythingV2Net("vits", max_depth=None)
        fi = {jax.tree_util.keystr(p): v.shape
              for p, v in jax.tree_util.tree_leaves_with_path(fresh.params)}
        ci = {jax.tree_util.keystr(p): np.shape(v)
              for p, v in jax.tree_util.tree_leaves_with_path(converted)}
        assert fi == ci


def make_synthetic_dav2_sd(rng, cond_dim: int = 0,
                           head_prefix: str = "depth_head") -> dict:
    """Reference-shaped torch state_dict for a vits DAv2 (optionally the
    PriorDA conditioned variant with patch_embed.alpha_proj; VDA checkpoints
    use head_prefix="head")."""
    D, depth = 384, 12
    cfg = DAV2_CONFIGS["vits"]
    sd = {}

    def add(key, shape):
        sd[key] = rng.normal(size=shape).astype(np.float32) * 0.02

    add("pretrained.patch_embed.proj.weight", (D, 3, 14, 14))
    add("pretrained.patch_embed.proj.bias", (D,))
    if cond_dim:
        add("pretrained.patch_embed.alpha_proj.weight", (D, cond_dim, 14, 14))
        add("pretrained.patch_embed.alpha_proj.bias", (D,))
    add("pretrained.cls_token", (1, 1, D))
    add("pretrained.pos_embed", (1, 37 * 37 + 1, D))
    add("pretrained.norm.weight", (D,))
    add("pretrained.norm.bias", (D,))
    for i in range(depth):
        b = f"pretrained.blocks.{i}"
        add(f"{b}.norm1.weight", (D,)); add(f"{b}.norm1.bias", (D,))
        add(f"{b}.attn.qkv.weight", (3 * D, D)); add(f"{b}.attn.qkv.bias", (3 * D,))
        add(f"{b}.attn.proj.weight", (D, D)); add(f"{b}.attn.proj.bias", (D,))
        add(f"{b}.ls1.gamma", (D,)); add(f"{b}.ls2.gamma", (D,))
        add(f"{b}.norm2.weight", (D,)); add(f"{b}.norm2.bias", (D,))
        add(f"{b}.mlp.fc1.weight", (4 * D, D)); add(f"{b}.mlp.fc1.bias", (4 * D,))
        add(f"{b}.mlp.fc2.weight", (D, 4 * D)); add(f"{b}.mlp.fc2.bias", (D,))

    oc = cfg["out_channels"]
    feats = cfg["features"]
    for i in range(4):
        add(f"{head_prefix}.projects.{i}.weight", (oc[i], D, 1, 1))
        add(f"{head_prefix}.projects.{i}.bias", (oc[i],))
        sd[f"{head_prefix}.scratch.layer{i + 1}_rn.weight"] = (
            rng.normal(size=(feats, oc[i], 3, 3)).astype(np.float32) * 0.02
        )
    add(f"{head_prefix}.resize_layers.0.weight", (oc[0], oc[0], 4, 4))
    add(f"{head_prefix}.resize_layers.0.bias", (oc[0],))
    add(f"{head_prefix}.resize_layers.1.weight", (oc[1], oc[1], 2, 2))
    add(f"{head_prefix}.resize_layers.1.bias", (oc[1],))
    add(f"{head_prefix}.resize_layers.3.weight", (oc[3], oc[3], 3, 3))
    add(f"{head_prefix}.resize_layers.3.bias", (oc[3],))
    for r in range(1, 5):
        rn = f"{head_prefix}.scratch.refinenet{r}"
        for u in (1, 2):
            add(f"{rn}.resConfUnit{u}.conv1.weight", (feats, feats, 3, 3))
            add(f"{rn}.resConfUnit{u}.conv1.bias", (feats,))
            add(f"{rn}.resConfUnit{u}.conv2.weight", (feats, feats, 3, 3))
            add(f"{rn}.resConfUnit{u}.conv2.bias", (feats,))
        add(f"{rn}.out_conv.weight", (feats, feats, 1, 1))
        add(f"{rn}.out_conv.bias", (feats,))
    add(f"{head_prefix}.scratch.output_conv1.weight", (feats // 2, feats, 3, 3))
    add(f"{head_prefix}.scratch.output_conv1.bias", (feats // 2,))
    add(f"{head_prefix}.scratch.output_conv2.0.weight", (32, feats // 2, 3, 3))
    add(f"{head_prefix}.scratch.output_conv2.0.bias", (32,))
    add(f"{head_prefix}.scratch.output_conv2.2.weight", (1, 32, 1, 1))
    add(f"{head_prefix}.scratch.output_conv2.2.bias", (1,))

    return sd


class TestVDA:
    def test_temporal_net_shapes(self):
        from vipe_tpu.priors.depth.videodepthanything import VideoDepthAnythingNet

        net = VideoDepthAnythingNet("vits", num_frames=4)
        clip = jnp.zeros((4, 70, 70, 3))
        out = net(clip)
        assert out.shape == (4, 70, 70)
        assert float(jnp.min(out)) >= 0.0

    def test_vda_converter_tree_parity(self, rng):
        """VDA checkpoint (pretrained + head.* incl. motion modules)
        converts to the exact flax tree."""
        from vipe_tpu.priors.depth.videodepthanything import (
            VideoDepthAnythingNet,
        )

        sd = make_synthetic_dav2_sd(rng, head_prefix="head")
        D = 384
        oc = DAV2_CONFIGS["vits"]["out_channels"]
        feats = DAV2_CONFIGS["vits"]["features"]
        motion_ch = (oc[2], oc[3], feats, feats)

        def add(key, shape):
            sd[key] = rng.normal(size=shape).astype(np.float32) * 0.02

        for m, C in enumerate(motion_ch):
            t = f"head.motion_modules.{m}.temporal_transformer"
            add(f"{t}.norm.weight", (C,)); add(f"{t}.norm.bias", (C,))
            add(f"{t}.proj_in.weight", (C, C)); add(f"{t}.proj_in.bias", (C,))
            b = f"{t}.transformer_blocks.0"
            for i in range(2):
                a = f"{b}.attention_blocks.{i}"
                add(f"{a}.to_q.weight", (C, C))
                add(f"{a}.to_k.weight", (C, C))
                add(f"{a}.to_v.weight", (C, C))
                add(f"{a}.to_out.0.weight", (C, C))
                add(f"{a}.to_out.0.bias", (C,))
                add(f"{b}.norms.{i}.weight", (C,))
                add(f"{b}.norms.{i}.bias", (C,))
            add(f"{b}.ff_norm.weight", (C,)); add(f"{b}.ff_norm.bias", (C,))
            add(f"{b}.ff.net.0.proj.weight", (8 * C, C))
            add(f"{b}.ff.net.0.proj.bias", (8 * C,))
            add(f"{b}.ff.net.2.weight", (C, 4 * C))
            add(f"{b}.ff.net.2.bias", (C,))
            add(f"{t}.proj_out.weight", (C, C))
            add(f"{t}.proj_out.bias", (C,))

        converted = mconvert.convert_vda(sd)
        fresh = VideoDepthAnythingNet("vits", num_frames=4)
        fi = {jax.tree_util.keystr(p): v.shape
              for p, v in jax.tree_util.tree_leaves_with_path(fresh.params)}
        ci = {jax.tree_util.keystr(p): np.shape(v)
              for p, v in jax.tree_util.tree_leaves_with_path(converted)}
        assert fi == ci, (
            sorted(set(fi) - set(ci))[:6], sorted(set(ci) - set(fi))[:6]
        )

        net = VideoDepthAnythingNet("vits", num_frames=4, params=converted)
        out = net(jnp.asarray(rng.random((4, 70, 70, 3)), jnp.float32))
        assert out.shape == (4, 70, 70)

    def test_stitching_recovers_affine_drift(self, rng):
        """Windows differing by an affine transform stitch into a consistent
        sequence (exercises the KEYFRAMES/OVERLAP bookkeeping)."""
        from vipe_tpu.priors.depth import videodepthanything as vda

        org_len = 2 * (vda.INFER_LEN - vda.OVERLAP) + 3
        base = [
            (rng.random((8, 8)) + 0.5).astype(np.float32)
            for _ in range(org_len + vda.INFER_LEN)
        ]
        # window outputs: window 0 = identity; window k scaled/shifted
        step = vda.INFER_LEN - vda.OVERLAP
        depth_list = []
        for wi, f0 in enumerate(range(0, org_len, step)):
            scale, shift = (1.0, 0.0) if wi == 0 else (2.0, 0.3)
            # overlap region repeats the previous window's KEYFRAMES frames
            for i in range(vda.INFER_LEN):
                if wi > 0 and i < vda.OVERLAP:
                    src = prev_ids[vda.KEYFRAMES[i]]
                else:
                    src = f0 + i
                depth_list.append(base[src] * scale + shift)
            prev_ids = list(range(f0, f0 + vda.INFER_LEN)) if wi == 0 else [
                prev_ids[k] for k in vda.KEYFRAMES
            ] + list(range(f0 + vda.OVERLAP, f0 + vda.INFER_LEN))

        out = vda.stitch_depth_windows(depth_list, org_len)
        assert out.shape[0] == org_len
        # after alignment, frame 0 and a frame from window 2 should be on the
        # same affine scale as window 0's outputs
        np.testing.assert_allclose(out[0], base[0], atol=1e-4)
        k = org_len - 1
        ref = base[k]
        got = out[k]
        s, b = vda.compute_scale_and_shift(got, ref)
        np.testing.assert_allclose(s, 1.0, atol=0.05)
        np.testing.assert_allclose(b, 0.0, atol=0.05)

    def test_compute_scale_and_shift(self, rng):
        x = rng.random((16, 16)).astype(np.float32)
        y = 3.0 * x + 0.7
        s, b = __import__("vipe_tpu.priors.depth.videodepthanything",
                          fromlist=["x"]).compute_scale_and_shift(x, y)
        assert abs(s - 3.0) < 1e-4 and abs(b - 0.7) < 1e-4
