"""ACTIVATION parity against the reference's own torch modules.

Each test instantiates the reference implementation (random weights, CPU,
via tests/reference_oracle.py stubs), converts its ``state_dict()`` with
``vipe_tpu.models.convert``, and checks our flax rewrite produces the same
activations on the same inputs.  This is checkpoint-readiness without
checkpoints: the converted tree has the exact key layout and the forward
math matches the implementation released weights were trained with.

Skipped automatically when /root/reference is unavailable.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.reference_oracle import ref_config, ref_module  # noqa: E402


class TestMetric3DDecoderParity:
    """RAFTDepthNormalDPT5 (reference metric3d/model/decode_heads/
    RAFTDepthNormalDPTDecoder5.py:999-1325) vs Metric3DDecoder."""

    def test_activation_parity_small(self):
        import jax.numpy as jnp

        from vipe_tpu.models import convert as mconvert
        from vipe_tpu.priors.depth.metric3d import (
            METRIC3D_CFGS, Metric3DDecoder,
        )

        cfg = ref_config(
            "vipe/priors/depth/metric3d/model/configs/vit.raft5.small.py"
        )
        cfg["model"]["decode_head"]["iters"] = 2  # keep the test fast
        m = ref_module(
            "vipe.priors.depth.metric3d.model.decode_heads"
            ".RAFTDepthNormalDPTDecoder5"
        )
        torch.manual_seed(0)
        dec_t = m.RAFTDepthNormalDPT5(cfg).eval()
        # get_bins() hardcodes device="cuda" — pre-register the expectation
        # anchor on CPU so the lazy path is skipped
        bins = torch.exp(
            torch.linspace(math.log(0.1), math.log(200.0), 256)
        )
        dec_t.register_buffer(
            "depth_expectation_anchor", bins.unsqueeze(0), persistent=False
        )

        B, H, W, D, R = 1, 6, 8, 384, 4
        gen = torch.Generator().manual_seed(1)
        tokens = [
            torch.randn(B, 1 + R + H * W, D, generator=gen) * 0.2
            for _ in range(4)
        ]
        with torch.no_grad():
            out = dec_t([list(tokens), (B, H, W, None, None, R)])
        depth_t = out["prediction"].numpy()[:, 0]
        conf_t = out["confidence"].numpy()[:, 0]
        normal_t = np.transpose(
            out["prediction_normal"].numpy(), (0, 2, 3, 1)
        )

        c = METRIC3D_CFGS["small"]
        dec_j = Metric3DDecoder(
            feature_channels=c["feature_channels"],
            decoder_channels=c["decoder_channels"],
            hidden=c["hidden"],
            iters=2,
        )
        params = mconvert.convert_metric3d_decoder(
            dec_t.state_dict(), prefix=""
        )
        taps = [
            (
                jnp.asarray(t[:, 1 + R:, :].numpy()),
                jnp.asarray(t[:, : 1 + R, :].reshape(B, -1).numpy()),
            )
            for t in tokens
        ]
        depth_j, normals_j, conf_j = dec_j.apply(params, taps, H, W)

        assert depth_t.shape == np.asarray(depth_j).shape
        np.testing.assert_allclose(
            np.asarray(depth_j), depth_t, rtol=2e-3, atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(conf_j), conf_t, rtol=2e-3, atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(normals_j), normal_t, rtol=2e-3, atol=2e-3
        )


class TestDroidNetParity:
    """The flagship SLAM operator vs the reference torch implementation
    (reference vipe/slam/networks/droid_net.py:289-552).  The reference
    DroidNet.__init__ downloads droid.pth, so the submodules are
    instantiated directly and the encode glue (ImageNet norm, tanh/relu
    split) is replicated per encode_features/encode_context:511-527.

    Runs our net at f32 (production uses bf16 — the reference likewise runs
    under fp16 autocast on CUDA; parity of the underlying math is what can
    be pinned exactly)."""

    @pytest.fixture(scope="class")
    def ref_and_ours(self):
        import jax.numpy as jnp

        from vipe_tpu.models import convert as mconvert
        from vipe_tpu.models.droidnet import DroidNet

        m = ref_module("vipe.slam.networks.droid_net")
        torch.manual_seed(0)
        fnet_t = m.BasicEncoder(output_dim=128, norm_fn="instance").eval()
        cnet_t = m.BasicEncoder(output_dim=256, norm_fn="none").eval()
        upd_t = m.UpdateModule().eval()
        sd = {}
        for mod, pre in ((fnet_t, "fnet"), (cnet_t, "cnet"),
                         (upd_t, "update")):
            for k, v in mod.state_dict().items():
                sd[f"{pre}.{k}"] = v
        params = mconvert.convert_droidnet(sd)
        model = DroidNet(dtype=jnp.float32)
        return m, fnet_t, cnet_t, upd_t, params, model

    def test_encoders(self, ref_and_ours):
        import jax.numpy as jnp

        _, fnet_t, cnet_t, _, params, model = ref_and_ours
        gen = torch.Generator().manual_seed(1)
        imgs = torch.rand(2, 3, 64, 96, generator=gen)
        mean = torch.as_tensor([0.485, 0.456, 0.406])
        std = torch.as_tensor([0.229, 0.224, 0.225])
        normed = (imgs[None] - mean[:, None, None]) / std[:, None, None]
        with torch.no_grad():
            fmap_t = fnet_t(normed).squeeze(0).numpy()
            net_t, inp_t = cnet_t(normed).split([128, 128], dim=2)
            net_t = net_t.tanh().squeeze(0).numpy()
            inp_t = inp_t.relu().squeeze(0).numpy()

        x_j = jnp.asarray(imgs.numpy().transpose(0, 2, 3, 1))
        fmap_j = model.apply(params, x_j, method="encode_features")
        net_j, inp_j = model.apply(params, x_j, method="encode_context")
        np.testing.assert_allclose(
            np.asarray(fmap_j).transpose(0, 3, 1, 2), fmap_t,
            rtol=2e-4, atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(net_j).transpose(0, 3, 1, 2), net_t,
            rtol=2e-4, atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(inp_j).transpose(0, 3, 1, 2), inp_t,
            rtol=2e-4, atol=2e-4,
        )

    def test_update_module(self, ref_and_ours):
        import jax.numpy as jnp

        from vipe_tpu.models.droidnet import CORR_PLANES, UpdateModule

        _, _, _, upd_t, params, _ = ref_and_ours
        E, ht, wd, N = 3, 8, 12, 2
        gen = torch.Generator().manual_seed(2)
        net0 = torch.randn(1, E, 128, ht, wd, generator=gen) * 0.2
        inp = torch.randn(1, E, 128, ht, wd, generator=gen) * 0.2
        corr = torch.randn(1, E, CORR_PLANES, ht, wd, generator=gen) * 0.2
        flow = torch.randn(1, E, 4, ht, wd, generator=gen) * 0.2
        ix = torch.tensor([0, 0, 1])
        with torch.no_grad():
            net1_t, delta_t, weight_t, eta_t, _upmask = upd_t(
                net0, inp, corr, flow, ix
            )

        def nhwc(t):  # (1, E, C, h, w) → (E, h, w, C)
            return jnp.asarray(t.numpy()[0].transpose(0, 2, 3, 1))

        upd_j = UpdateModule(dtype=jnp.float32)
        net1_j, delta_j, weight_j, eta_j = upd_j.apply(
            {"params": params["params"]["update"]},
            nhwc(net0), nhwc(inp), nhwc(corr), nhwc(flow),
            jnp.asarray(ix.numpy()), N,
        )
        np.testing.assert_allclose(
            np.asarray(net1_j).transpose(0, 3, 1, 2), net1_t.numpy()[0],
            rtol=2e-4, atol=2e-4,
        )
        # reference delta/weight are already (1, E, h, w, 2)
        np.testing.assert_allclose(
            np.asarray(delta_j), delta_t.numpy()[0], rtol=2e-4, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(weight_j), weight_t.numpy()[0], rtol=2e-4, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(eta_j), eta_t.numpy()[0], rtol=2e-4, atol=2e-4
        )


class TestDinov2Parity:
    """DAv2's vendored DINOv2 (reference vipe/priors/depth/dav2/dinov2.py)
    vs models/vit.py DinoViT + convert_dinov2_vit.

    img_size == input size, so the pos-embed interpolation path (which uses
    torch-specific bicubic+offset semantics) stays off on both sides."""

    def test_vit_small_taps(self):
        import jax.numpy as jnp

        from vipe_tpu.models import convert as mconvert
        from vipe_tpu.models.vit import make_vit

        m = ref_module("vipe.priors.depth.dav2.dinov2")
        torch.manual_seed(0)
        vt = m.vit_small(
            img_size=112, patch_size=14, init_values=1.0,
            ffn_layer="mlp", block_chunks=0, num_register_tokens=0,
        ).eval()

        gen = torch.Generator().manual_seed(1)
        x_t = torch.randn(1, 3, 112, 112, generator=gen)
        taps = (2, 5, 8, 11)
        with torch.no_grad():
            out_t = vt.get_intermediate_layers(
                x_t, n=list(taps), return_class_token=True
            )

        vit_j = make_vit("vits", img_size=112)
        params = mconvert.convert_dinov2_vit(vt.state_dict(), prefix="")
        x_j = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1))
        out_j = vit_j.apply(params, x_j, tap_layers=taps)

        for (pt_t, cls_t), (pt_j, cls_j) in zip(out_t, out_j):
            np.testing.assert_allclose(
                np.asarray(pt_j), pt_t.numpy(), rtol=2e-4, atol=2e-4
            )
            np.testing.assert_allclose(
                np.asarray(cls_j), cls_t.numpy(), rtol=2e-4, atol=2e-4
            )


class TestUniDepthDecoderParity:
    """UniDepth v2 Decoder (reference vipe/priors/depth/unidepth/models/
    unidepthv2/decoder.py:340-529) vs UniDepthDecoder + convert_unidepth_decoder.

    Exercises the GT-rays path ViPE uses (unidepth/__init__.py:26-69):
    camera head intrinsics + ray-conditioned depth head through the real
    fourier embedding, prompt attention, ConvTranspose feature pyramid and
    reflect-padded output convs."""

    def test_decoder_small(self):
        import jax.numpy as jnp

        from vipe_tpu.models import convert as mconvert
        from vipe_tpu.priors.depth.unidepth import (
            UniDepthConfig, UniDepthDecoder,
        )

        m = ref_module(
            "vipe.priors.depth.unidepth.models.unidepthv2.decoder"
        )
        D_in, d = 48, 64
        config = {
            "model": {
                "expansion": 2,
                "num_heads": 2,
                "layer_scale": 1.0,
                "pixel_encoder": {
                    "embed_dims": [D_in] * 12,
                    "depths": [3, 6, 9, 12],
                },
                "pixel_decoder": {
                    "hidden_dim": d,
                    "dropout": 0.0,
                    "depths": [1, 1, 1],
                    "out_dim": 16,
                    "kernel_size": 3,
                },
            }
        }
        torch.manual_seed(0)
        dec_t = m.Decoder(config).eval()

        B, H, W = 1, 42, 56
        h, w = H // 14, W // 14
        gen = torch.Generator().manual_seed(1)
        feats_t = [
            torch.randn(B, h, w, D_in, generator=gen) * 0.5 for _ in range(4)
        ]
        cls_t = [
            torch.randn(B, 1, D_in, generator=gen) * 0.5 for _ in range(4)
        ]
        # normalized GT rays from a plausible pinhole camera
        u, v = np.meshgrid(
            np.arange(W, dtype=np.float32) + 0.5,
            np.arange(H, dtype=np.float32) + 0.5,
        )
        rays = np.stack([(u - W / 2) / (0.8 * W), (v - H / 2) / (0.8 * W),
                         np.ones_like(u)], 0)
        rays = rays / np.linalg.norm(rays, axis=0, keepdims=True)
        rays_t = torch.as_tensor(rays, dtype=torch.float32)[None]

        with torch.no_grad():
            out_t = dec_t(
                {
                    "image": torch.zeros(B, 3, H, W),
                    "features": feats_t,
                    "tokens": cls_t,
                    "rays": rays_t,
                },
                [],
            )
        radius_t = out_t["radius"].numpy()[:, 0]
        conf_t = out_t["confidence"].numpy()[:, 0]
        K_t = out_t["intrinsics"].numpy()

        cfg = UniDepthConfig(
            hidden_dim=d, num_heads=2, expansion=2, depths=(1, 1, 1),
            out_dim=16, kernel_size=3, layer_scale=1.0,
        )
        dec_j = UniDepthDecoder(cfg, input_dim=D_in)
        params = mconvert.convert_unidepth_decoder(
            dec_t.state_dict(), prefix=""
        )
        feats_j = [jnp.asarray(f.numpy().reshape(B, h * w, D_in))
                   for f in feats_t]
        cls_j = [jnp.asarray(c.numpy()[:, 0]) for c in cls_t]
        rays_j = jnp.asarray(rays.transpose(1, 2, 0))[None]
        out_j = dec_j.apply(params, feats_j, cls_j, (H, W), rays_j)

        radius_j = np.asarray(out_j["points"][..., 2] / out_j["rays"][..., 2])
        np.testing.assert_allclose(radius_j, radius_t, rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(out_j["confidence"]), conf_t, rtol=2e-4, atol=2e-4
        )
        intr_j = np.asarray(out_j["intrinsics"])
        np.testing.assert_allclose(intr_j[:, 0], K_t[:, 0, 0], rtol=2e-4)
        np.testing.assert_allclose(intr_j[:, 1], K_t[:, 1, 1], rtol=2e-4)
        np.testing.assert_allclose(intr_j[:, 2], K_t[:, 0, 2], rtol=2e-4)
        np.testing.assert_allclose(intr_j[:, 3], K_t[:, 1, 2], rtol=2e-4)


class TestUniDepthInferPolicyParity:
    """UniDepth v2 ``infer()`` pre/post policy (reference unidepthv2.py:
    238-330 + helpers :49-119): aspect-ratio padding, pixel-bound /14
    resize, resolution-level decile narrowing, and the padded-camera
    intrinsics transform that conditions the rays — vs the rebuild's
    policy functions in vipe_tpu.priors.depth.unidepth (decoder/encoder
    activation parity is covered separately; this pins the glue)."""

    SHAPES = [(720, 1280), (1280, 720), (384, 512), (100, 923), (923, 100),
              (518, 518), (47, 1000)]

    def test_paddings_and_resize(self):
        m = ref_module(
            "vipe.priors.depth.unidepth.models.unidepthv2.unidepthv2"
        )
        from vipe_tpu.priors.depth.unidepth import (
            get_paddings, get_resize_factor, resolution_level_bounds,
        )

        for shape in self.SHAPES:
            for rb in [(0.5, 2.5), (0.66, 2.0), (1.0, 1.0)]:
                pads_t, padded_t = m.get_paddings(shape, rb)
                pads_j, padded_j = get_paddings(shape, rb)
                assert pads_j == tuple(pads_t), (shape, rb)
                assert padded_j == tuple(padded_t), (shape, rb)
                for pr in [(200_000, 500_000), (1_000, 20_000_000),
                           (700_000, 900_000)]:
                    rf_t, new_t = m.get_resize_factor(padded_t, pr)
                    rf_j, new_j = get_resize_factor(padded_j, pr)
                    assert new_j == tuple(new_t), (shape, rb, pr)
                    np.testing.assert_allclose(rf_j, rf_t, rtol=1e-12)

    def test_resolution_level_deciles(self):
        """resolution_level narrows the pixel bounds to one decile
        (unidepthv2.py:249-255)."""
        from vipe_tpu.priors.depth.unidepth import resolution_level_bounds

        pmin, pmax = 200_000, 500_000
        interval = (pmax - pmin) / 10
        for level in range(10):
            lo, hi = resolution_level_bounds(pmin, pmax, level)
            assert lo == level * interval + pmin
            assert hi == (level + 1) * interval + pmin
        assert resolution_level_bounds(pmin, pmax, None) == (pmin, pmax)

    def test_padded_camera_rays_match_reference_crop_resize(self):
        """Our adapter builds rays from (f·rf, (W/2+pl)·rf, (H/2+pt)·rf);
        the reference gets there via camera.crop(-pads).resize(rf)
        (unidepthv2.py:288-291).  Verify against the reference Pinhole."""
        m = ref_module(
            "vipe.priors.depth.unidepth.models.unidepthv2.unidepthv2"
        )
        from vipe_tpu.priors.depth.unidepth import (
            get_paddings, get_resize_factor,
        )

        for (h, w) in [(720, 1280), (384, 512), (100, 923)]:
            f = 0.9 * w
            K = torch.tensor(
                [[f, 0.0, w / 2], [0.0, f, h / 2], [0.0, 0.0, 1.0]]
            )[None]
            cam = m.Pinhole(K=K.clone())
            (pl, pr, pt, pb), (hp, wp) = get_paddings((h, w), (0.5, 2.5))
            rf, _ = get_resize_factor((hp, wp), (200_000, 500_000))
            cam = cam.crop(left=-pl, top=-pt, right=-pr, bottom=-pb)
            cam = cam.resize(rf)
            K2 = cam.K[0].numpy()
            np.testing.assert_allclose(K2[0, 0], f * rf, rtol=1e-5)
            np.testing.assert_allclose(K2[0, 2], (w / 2 + pl) * rf,
                                       rtol=1e-5)
            np.testing.assert_allclose(K2[1, 2], (h / 2 + pt) * rf,
                                       rtol=1e-5)


class TestGeoCalibNetParity:
    """GeoCalib perception net (reference vipe/priors/geocalib/geocalib.py:
    28-103 + modules.py: MSCAN backbone, LowLevelEncoder, LightHamHead
    up/latitude decoders) vs GeoCalibNet + convert_geocalib.

    The reference's NMF2D draws fresh random bases every forward
    (modules.py:139-143); both sides are given the SAME fixed bases so the
    comparison is exact."""

    def test_net_parity(self):
        import jax.numpy as jnp
        import torch.nn.functional as F

        from vipe_tpu.models import convert as mconvert
        from vipe_tpu.priors.geocalib.network import GeoCalibNet

        gm = ref_module("vipe.priors.geocalib.geocalib")
        mm = ref_module("vipe.priors.geocalib.modules")

        rng = np.random.default_rng(7)
        fixed_bases = torch.from_numpy(
            rng.random((1, 512, 64)).astype(np.float32)
        )

        def fixed_build_bases(self, B, S, D, R, device="cpu"):
            return F.normalize(fixed_bases.repeat(B * S, 1, 1), dim=1)

        orig = mm.NMF2D._build_bases
        mm.NMF2D._build_bases = fixed_build_bases
        try:
            torch.manual_seed(0)
            backbone = mm.MSCAN().eval()
            ll_enc = gm.LowLevelEncoder().eval()
            persp = gm.PerspectiveDecoder().eval()

            img_t = torch.rand(1, 3, 64, 96,
                               generator=torch.Generator().manual_seed(1))
            with torch.no_grad():
                feats = {
                    "hl": backbone({"image": img_t})["features"],
                    "ll": ll_enc({"image": img_t})["features"],
                }
                out_t = persp({"features": feats})
        finally:
            mm.NMF2D._build_bases = orig

        sd = {}
        for mod, pre in ((backbone, "backbone"), (ll_enc, "ll_enc"),
                         (persp, "perspective_decoder")):
            for k, v in mod.state_dict().items():
                sd[f"{pre}.{k}"] = v
        variables = mconvert.convert_geocalib(sd)

        bases_j = jnp.asarray(
            (fixed_bases / fixed_bases.norm(dim=1, keepdim=True)).numpy()
        )
        img_j = jnp.asarray(img_t.numpy().transpose(0, 2, 3, 1))
        out_j = GeoCalibNet().apply(variables, img_j, nmf_bases=bases_j)

        np.testing.assert_allclose(
            np.asarray(out_j["up_field"]).transpose(0, 3, 1, 2),
            out_t["up_field"].numpy(), rtol=2e-4, atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out_j["latitude_field"]),
            out_t["latitude_field"].numpy()[:, 0], rtol=2e-4, atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out_j["up_confidence"]),
            out_t["up_confidence"].numpy(), rtol=2e-4, atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out_j["latitude_confidence"]),
            out_t["latitude_confidence"].numpy(), rtol=2e-4, atol=2e-4,
        )


class TestGeoCalibLMOptimizerParity:
    """GeoCalib LM optimizer, jointly with the field model (reference
    lm_optimizer.py:519-609 + perspective_fields.py): feed BOTH optimizers
    the SAME ground-truth perspective fields (generated by the reference's
    own get_perspective_field) and require the recovered focal/roll/pitch
    to agree — a wrong damping schedule, field convention (sin vs rad), or
    up-sign flip diverges here even though the net parity test passes."""

    def test_lm_recovers_same_camera(self):
        lmm = ref_module("vipe.priors.geocalib.lm_optimizer")
        cm = ref_module("vipe.priors.geocalib.camera")
        gm = ref_module("vipe.priors.geocalib.gravity")
        pf = ref_module("vipe.priors.geocalib.perspective_fields")
        um = ref_module("vipe.priors.geocalib.utils")

        from vipe_tpu.priors.geocalib.optimizer import calibrate_from_fields

        h, w = 32, 40
        f_gt, roll_gt, pitch_gt = 1.1 * w, 0.12, -0.18
        cam_gt = cm.camera_models["pinhole"].from_dict({
            "width": torch.tensor([float(w)]),
            "height": torch.tensor([float(h)]),
            "vfov": um.focal2fov(torch.tensor([f_gt]),
                                 torch.tensor([float(h)])),
        })
        grav_gt = gm.Gravity.from_rp(
            torch.tensor([roll_gt]), torch.tensor([pitch_gt])
        )
        with torch.no_grad():
            up_gt, lat_gt = pf.get_perspective_field(cam_gt, grav_gt)

        # data latitude convention is RADIANS (get_perspective_field returns
        # get_latitude_field's asin; verified residual(GT) == 0 with radians)
        lm_t = lmm.LMOptimizer({"camera_model": "pinhole"}).eval()
        with torch.no_grad():
            out_t = lm_t({"up_field": up_gt, "latitude_field": lat_gt})
        f_t = float(out_t["camera"].f[0, 1])
        roll_t, pitch_t = (float(v) for v in out_t["gravity"].rp[0])

        # our LM: up (B, h, w, 2), latitude in radians too
        res = calibrate_from_fields(
            np.asarray(up_gt.permute(0, 2, 3, 1)),
            np.asarray(lat_gt[:, 0]),
        )
        f_j = float(res.focal)
        roll_j, pitch_j = float(res.roll[0]), float(res.pitch[0])

        # both must land on the GT optimum (and hence each other)
        np.testing.assert_allclose(f_j, f_t, rtol=2e-3)
        np.testing.assert_allclose(
            [roll_j, pitch_j], [roll_t, pitch_t], atol=2e-3
        )
        np.testing.assert_allclose(f_t, f_gt, rtol=5e-3)
        np.testing.assert_allclose(f_j, f_gt, rtol=5e-3)
        np.testing.assert_allclose(
            [roll_j, pitch_j], [roll_gt, pitch_gt], atol=5e-3
        )


class TestSamParity:
    """SAM (reference vipe/priors/track_anything/sam/modeling/) vs the flax
    SamPredictor modules + convert_sam: ViT image encoder (windowed + global
    decomposed-rel-pos attention, LayerNorm2d neck), box prompt encoder,
    TwoWayTransformer mask decoder incl. the dense no-mask embedding and the
    mask-prompt (downscaling) refinement path."""

    def _build_ref(self):
        enc_m = ref_module(
            "vipe.priors.track_anything.sam.modeling.image_encoder"
        )
        pr_m = ref_module(
            "vipe.priors.track_anything.sam.modeling.prompt_encoder"
        )
        dec_m = ref_module(
            "vipe.priors.track_anything.sam.modeling.mask_decoder"
        )
        tr_m = ref_module(
            "vipe.priors.track_anything.sam.modeling.transformer"
        )
        import functools as ft
        torch.manual_seed(0)
        enc_t = enc_m.ImageEncoderViT(
            img_size=64, patch_size=16, embed_dim=64, depth=3, num_heads=2,
            mlp_ratio=4, out_chans=256, qkv_bias=True,
            norm_layer=ft.partial(torch.nn.LayerNorm, eps=1e-6),
            use_rel_pos=True, global_attn_indexes=(1,), window_size=2,
        ).eval()
        pr_t = pr_m.PromptEncoder(
            embed_dim=256, image_embedding_size=(4, 4),
            input_image_size=(64, 64), mask_in_chans=16,
        ).eval()
        dec_t = dec_m.MaskDecoder(
            transformer_dim=256,
            transformer=tr_m.TwoWayTransformer(
                depth=2, embedding_dim=256, mlp_dim=2048, num_heads=8
            ),
            num_multimask_outputs=3,
        ).eval()
        # nonzero rel-pos tables so the decomposed bias path is exercised
        with torch.no_grad():
            for blk in enc_t.blocks:
                blk.attn.rel_pos_h.normal_(std=0.1)
                blk.attn.rel_pos_w.normal_(std=0.1)
        sd = {}
        for mod, pre in ((enc_t, "image_encoder"), (pr_t, "prompt_encoder"),
                         (dec_t, "mask_decoder")):
            for k, v in mod.state_dict().items():
                sd[f"{pre}.{k}"] = v
        return enc_t, pr_t, dec_t, sd

    def test_sam_parity(self):
        import jax.numpy as jnp

        from vipe_tpu.models import convert as mconvert
        from vipe_tpu.priors.track_anything.sam import (
            ImageEncoderViT, MaskDecoder, MaskPromptEncoder, PromptEncoder,
        )

        enc_t, pr_t, dec_t, sd = self._build_ref()
        params = mconvert.convert_sam(sd)

        gen = torch.Generator().manual_seed(1)
        img_t = torch.randn(1, 3, 64, 64, generator=gen)
        boxes_t = torch.tensor([[5.0, 8.0, 50.0, 40.0]])

        with torch.no_grad():
            emb_t = enc_t(img_t)
            sparse_t, dense_t = pr_t(points=None, boxes=boxes_t, masks=None)
            masks_t, iou_t = dec_t(
                image_embeddings=emb_t,
                image_pe=pr_t.get_dense_pe(),
                sparse_prompt_embeddings=sparse_t,
                dense_prompt_embeddings=dense_t,
                multimask_output=True,
            )
            # refinement pass: best logits as a mask prompt
            best = int(torch.argmax(iou_t[0]))
            logits_t = masks_t[:, best]
            sparse2_t, dense2_t = pr_t(
                points=None, boxes=boxes_t, masks=logits_t[None]
            )
            masks2_t, iou2_t = dec_t(
                image_embeddings=emb_t,
                image_pe=pr_t.get_dense_pe(),
                sparse_prompt_embeddings=sparse2_t,
                dense_prompt_embeddings=dense2_t,
                multimask_output=True,
            )

        enc_j = ImageEncoderViT(
            embed_dim=64, depth=3, num_heads=2, global_attn=(1,),
            window_size=2, img_size=64,
        )
        emb_j = enc_j.apply(params["encoder"],
                            jnp.asarray(img_t.numpy().transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(emb_j).transpose(0, 3, 1, 2), emb_t.numpy(),
            rtol=2e-4, atol=2e-4,
        )

        pr_j = PromptEncoder(img_size=64)
        pts = jnp.asarray([[[5.0, 8.0], [50.0, 40.0]]])
        sparse_j, dense_pe_j, no_mask_j = pr_j.apply(params["prompt"], pts)
        np.testing.assert_allclose(
            np.asarray(sparse_j), sparse_t.numpy(), rtol=2e-4, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(dense_pe_j).transpose(2, 0, 1),
            pr_t.get_dense_pe().numpy()[0], rtol=2e-4, atol=2e-4,
        )

        dec_j = MaskDecoder()
        masks_j, iou_j = dec_j.apply(
            params["decoder"], jnp.asarray(emb_t.numpy().transpose(0, 2, 3, 1)),
            dense_pe_j, jnp.asarray(sparse_t.numpy()), no_mask_j,
        )
        # reference multimask_output=True slices [1:4]
        np.testing.assert_allclose(
            np.asarray(masks_j)[:, 1:], masks_t.numpy(), rtol=2e-3, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(iou_j)[:, 1:], iou_t.numpy(), rtol=2e-3, atol=2e-4
        )

        # mask-prompt refinement pass
        mp_j = MaskPromptEncoder()
        dense_j = mp_j.apply(
            params["mask_prompt"],
            jnp.asarray(logits_t.numpy())[..., None],
        )
        masks2_j, iou2_j = dec_j.apply(
            params["decoder"], jnp.asarray(emb_t.numpy().transpose(0, 2, 3, 1)),
            dense_pe_j, jnp.asarray(sparse2_t.numpy()), dense_j,
        )
        np.testing.assert_allclose(
            np.asarray(masks2_j)[:, 1:], masks2_t.numpy(),
            rtol=2e-3, atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(iou2_j)[:, 1:], iou2_t.numpy(), rtol=2e-3, atol=2e-4
        )


class TestGDINOParity:
    """GroundingDINO components (reference vipe/priors/track_anything/
    groundingdino/models/main/) vs the flax gdino modules + converter
    helpers: Swin backbone, BERT warper, MSDeformAttn (vs the reference's
    own pytorch fallback), image-text fusion, text enhancer, deformable
    encoder/decoder layers."""

    def test_swin_backbone(self):
        import jax.numpy as jnp

        m = ref_module(
            "vipe.priors.track_anything.groundingdino.models.main"
            ".backbone.swin_transformer"
        )
        from vipe_tpu.priors.track_anything.gdino import convert as gc
        from vipe_tpu.priors.track_anything.gdino.swin import SwinTransformer

        torch.manual_seed(0)
        depths, heads, e, win = (2, 2, 2, 2), (1, 2, 4, 8), 16, 3
        sw_t = m.SwinTransformer(
            embed_dim=e, depths=list(depths), num_heads=list(heads),
            window_size=win, drop_path_rate=0.0, out_indices=(1, 2, 3),
        )
        sw_t.eval()  # SwinTransformer.train() override returns None
        img_t = torch.randn(1, 3, 32, 48,
                            generator=torch.Generator().manual_seed(1))
        with torch.no_grad():
            outs_t = sw_t.forward_raw(img_t)

        sd = {f"backbone.0.{k}": v for k, v in sw_t.state_dict().items()}
        p = {
            "patch_embed_proj": gc._conv(sd, "backbone.0.patch_embed.proj"),
            "patch_embed_norm": gc._ln(sd, "backbone.0.patch_embed.norm"),
        }
        for i, depth in enumerate(depths):
            for b in range(depth):
                k = f"backbone.0.layers.{i}.blocks.{b}"
                p[f"layers_{i}_blocks_{b}"] = {
                    "norm1": gc._ln(sd, f"{k}.norm1"),
                    "norm2": gc._ln(sd, f"{k}.norm2"),
                    "attn": {
                        "qkv": gc._lin(sd, f"{k}.attn.qkv"),
                        "proj": gc._lin(sd, f"{k}.attn.proj"),
                        "relative_position_bias_table": np.asarray(
                            sd[f"{k}.attn.relative_position_bias_table"]
                        ),
                    },
                    "mlp": {"fc1": gc._lin(sd, f"{k}.mlp.fc1"),
                            "fc2": gc._lin(sd, f"{k}.mlp.fc2")},
                }
            if i < 3:
                k = f"backbone.0.layers.{i}.downsample"
                p[f"layers_{i}_downsample"] = {
                    "norm": gc._ln(sd, f"{k}.norm"),
                    "reduction": gc._lin_nobias(sd, f"{k}.reduction"),
                }
        for i in (1, 2, 3):
            p[f"out_norm{i}"] = gc._ln(sd, f"backbone.0.norm{i}")

        sw_j = SwinTransformer(e, depths, heads, win)
        outs_j = sw_j.apply(
            {"params": p}, jnp.asarray(img_t.numpy().transpose(0, 2, 3, 1))
        )
        for oj, ot in zip(outs_j, outs_t):
            np.testing.assert_allclose(
                np.asarray(oj).transpose(0, 3, 1, 2), ot.numpy(),
                rtol=2e-4, atol=2e-4,
            )

    def test_bert_warper(self):
        import jax.numpy as jnp
        import transformers

        bw = ref_module(
            "vipe.priors.track_anything.groundingdino.models.main.bertwarper"
        )
        from vipe_tpu.priors.track_anything.gdino import convert as gc
        from vipe_tpu.priors.track_anything.gdino.bert import (
            BertConfig, BertEncoder,
        )

        torch.manual_seed(0)
        hf_cfg = transformers.BertConfig(
            vocab_size=200, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=64, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
        )
        bert_t = bw.BertModelWarper(
            bert_model=transformers.BertModel(hf_cfg).eval()
        )

        rng = np.random.default_rng(3)
        L = 12
        ids = rng.integers(5, 200, size=(1, L)).astype(np.int64)
        mask3d = np.tril(np.ones((1, L, L), bool))  # arbitrary 3D mask
        pos = np.concatenate([np.arange(7), np.arange(L - 7)])[None]
        with torch.no_grad():
            out_t = bert_t(
                input_ids=torch.as_tensor(ids),
                attention_mask=torch.as_tensor(mask3d),
                position_ids=torch.as_tensor(pos),
                token_type_ids=torch.zeros_like(torch.as_tensor(ids)),
            )["last_hidden_state"].numpy()

        sd = {f"bert.{k}": v for k, v in bert_t.state_dict().items()}
        c = BertConfig(vocab_size=200, hidden_size=32, num_layers=2,
                       num_heads=4, intermediate_size=64, max_position=64)
        bp = {
            "word_embeddings": np.asarray(
                sd["bert.embeddings.word_embeddings.weight"]),
            "position_embeddings": np.asarray(
                sd["bert.embeddings.position_embeddings.weight"]),
            "token_type_embeddings": np.asarray(
                sd["bert.embeddings.token_type_embeddings.weight"]),
            "embeddings_norm": gc._ln(sd, "bert.embeddings.LayerNorm"),
        }
        for i in range(2):
            k = f"bert.encoder.layer.{i}"
            bp[f"layer_{i}"] = {
                "attention_self": {
                    "query": gc._lin(sd, f"{k}.attention.self.query"),
                    "key": gc._lin(sd, f"{k}.attention.self.key"),
                    "value": gc._lin(sd, f"{k}.attention.self.value"),
                },
                "attention_output_dense": gc._lin(
                    sd, f"{k}.attention.output.dense"),
                "attention_output_norm": gc._ln(
                    sd, f"{k}.attention.output.LayerNorm"),
                "intermediate_dense": gc._lin(sd, f"{k}.intermediate.dense"),
                "output_dense": gc._lin(sd, f"{k}.output.dense"),
                "output_norm": gc._ln(sd, f"{k}.output.LayerNorm"),
            }
        out_j = BertEncoder(c).apply(
            {"params": bp}, jnp.asarray(ids.astype(np.int32)),
            jnp.asarray(mask3d), jnp.asarray(pos.astype(np.int32)),
        )
        np.testing.assert_allclose(
            np.asarray(out_j), out_t, rtol=2e-4, atol=2e-4
        )

    def _msda_inputs(self, seed=4):
        rng = np.random.default_rng(seed)
        shapes = [(6, 8), (3, 4)]
        S = sum(h * w for h, w in shapes)
        B, Q, d = 1, 10, 32
        query = rng.normal(size=(B, Q, d)).astype(np.float32)
        value = rng.normal(size=(B, S, d)).astype(np.float32)
        ref2 = rng.uniform(0.1, 0.9, size=(B, Q, 2)).astype(np.float32)
        ref2 = np.broadcast_to(ref2[:, :, None], (B, Q, 2, 2)).copy()
        return shapes, query, value, ref2

    def test_msdeform_module(self):
        import jax.numpy as jnp

        m = ref_module(
            "vipe.priors.track_anything.groundingdino.models.main"
            ".ms_deform_attn"
        )
        from vipe_tpu.priors.track_anything.gdino import convert as gc
        from vipe_tpu.priors.track_anything.gdino.transformer import (
            MSDeformAttnModule,
        )

        torch.manual_seed(0)
        att_t = m.MultiScaleDeformableAttention(
            embed_dim=32, num_levels=2, num_heads=4, num_points=3,
            batch_first=True,
        ).eval()
        # non-degenerate offsets/weights
        with torch.no_grad():
            for p_ in att_t.parameters():
                p_.add_(torch.randn_like(p_) * 0.05)

        shapes, query, value, ref2 = self._msda_inputs()
        ss_t = torch.as_tensor(shapes, dtype=torch.long)
        lsi = torch.as_tensor([0, shapes[0][0] * shapes[0][1]])
        with torch.no_grad():
            out_t = att_t(
                query=torch.as_tensor(query),
                value=torch.as_tensor(value),
                reference_points=torch.as_tensor(ref2),
                spatial_shapes=ss_t,
                level_start_index=lsi,
            ).numpy()

        sd = {f"a.{k}": v for k, v in att_t.state_dict().items()}
        p = gc._msdeform(sd, "a")
        p = {k: {kk: np.asarray(vv) for kk, vv in v.items()}
             for k, v in p.items()}
        att_j = MSDeformAttnModule(32, 4, 2, 3)
        out_j = att_j.apply(
            {"params": p}, jnp.asarray(query), jnp.asarray(ref2),
            jnp.asarray(value), shapes,
        )
        np.testing.assert_allclose(
            np.asarray(out_j), out_t, rtol=2e-4, atol=2e-4
        )

    def test_fusion_and_text_layer(self):
        import jax.numpy as jnp

        fm = ref_module(
            "vipe.priors.track_anything.groundingdino.models.main"
            ".fuse_modules"
        )
        tv = ref_module(
            "vipe.priors.track_anything.groundingdino.models.main"
            ".transformer_vanilla"
        )
        from vipe_tpu.priors.track_anything.gdino import convert as gc
        from vipe_tpu.priors.track_anything.gdino.transformer import (
            BiAttentionBlock, TextEnhancerLayer,
        )

        torch.manual_seed(0)
        d, emb, heads = 32, 16, 4
        fuse_t = fm.BiAttentionBlock(
            v_dim=d, l_dim=d, embed_dim=emb, num_heads=heads, dropout=0.0
        ).eval()
        text_t = tv.TransformerEncoderLayer(
            d_model=d, nhead=heads, dim_feedforward=64, dropout=0.0
        ).eval()

        rng = np.random.default_rng(5)
        Nv, Nl = 24, 9
        v = rng.normal(size=(1, Nv, d)).astype(np.float32)
        l = rng.normal(size=(1, Nl, d)).astype(np.float32)
        tmask = np.ones((1, Nl), bool)
        tmask[0, 7:] = False                     # last two tokens padded
        mask3d = np.tile(np.eye(Nl, dtype=bool), (1, 1, 1))
        mask3d[0, :7, :7] = True
        pos_text = rng.normal(size=(1, Nl, d)).astype(np.float32)

        with torch.no_grad():
            v2_t, l2_t = fuse_t(
                v=torch.as_tensor(v), l=torch.as_tensor(l),
                attention_mask_v=None,
                attention_mask_l=torch.as_tensor(~tmask),
            )
            l3_t = text_t(
                src=torch.as_tensor(l).transpose(0, 1),
                src_mask=torch.as_tensor(~mask3d),
                src_key_padding_mask=None,
                pos=torch.as_tensor(pos_text).transpose(0, 1),
            ).transpose(0, 1)

        sd_f = {k: v_ for k, v_ in fuse_t.state_dict().items()}
        pf = {
            "layer_norm_v": gc._ln(sd_f, "layer_norm_v"),
            "layer_norm_l": gc._ln(sd_f, "layer_norm_l"),
            "attn": gc._bi_attn(sd_f, "attn"),
            "gamma_v": np.asarray(sd_f["gamma_v"]),
            "gamma_l": np.asarray(sd_f["gamma_l"]),
        }
        v2_j, l2_j = BiAttentionBlock(d, d, emb, heads).apply(
            {"params": pf}, jnp.asarray(v), jnp.asarray(l),
            jnp.asarray(tmask),
        )
        np.testing.assert_allclose(
            np.asarray(v2_j), v2_t.numpy(), rtol=2e-4, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(l2_j), l2_t.numpy(), rtol=2e-4, atol=2e-4
        )

        sd_t = {k: v_ for k, v_ in text_t.state_dict().items()}
        pt = {
            "self_attn": gc._mha(sd_t, "self_attn", d),
            "linear1": gc._lin(sd_t, "linear1"),
            "linear2": gc._lin(sd_t, "linear2"),
            "norm1": gc._ln(sd_t, "norm1"),
            "norm2": gc._ln(sd_t, "norm2"),
        }
        l3_j = TextEnhancerLayer(d, heads, 64).apply(
            {"params": pt}, jnp.asarray(l), jnp.asarray(pos_text),
            jnp.asarray(mask3d),
        )
        np.testing.assert_allclose(
            np.asarray(l3_j), l3_t.numpy(), rtol=2e-4, atol=2e-4
        )

    def test_deformable_encoder_decoder_layers(self):
        import jax.numpy as jnp

        tr = ref_module(
            "vipe.priors.track_anything.groundingdino.models.main.transformer"
        )
        from vipe_tpu.priors.track_anything.gdino import convert as gc
        from vipe_tpu.priors.track_anything.gdino.transformer import (
            DeformableDecoderLayer, DeformableEncoderLayer,
            encoder_reference_points,
        )

        torch.manual_seed(0)
        d, heads, L, P, ffn = 32, 4, 2, 3, 64
        enc_t = tr.DeformableTransformerEncoderLayer(
            d_model=d, d_ffn=ffn, dropout=0.0, n_levels=L, n_heads=heads,
            n_points=P,
        ).eval()
        dec_t = tr.DeformableTransformerDecoderLayer(
            d_model=d, d_ffn=ffn, dropout=0.0, n_levels=L, n_heads=heads,
            n_points=P, use_text_cross_attention=True,
        ).eval()
        with torch.no_grad():
            for p_ in enc_t.self_attn.parameters():
                p_.add_(torch.randn_like(p_) * 0.05)
            for p_ in dec_t.cross_attn.parameters():
                p_.add_(torch.randn_like(p_) * 0.05)

        shapes = [(6, 8), (3, 4)]
        S = sum(h * w for h, w in shapes)
        rng = np.random.default_rng(6)
        src = rng.normal(size=(1, S, d)).astype(np.float32)
        pos = rng.normal(size=(1, S, d)).astype(np.float32)
        ref = encoder_reference_points(shapes)  # (1, S, L, 2)
        ss_t = torch.as_tensor(shapes, dtype=torch.long)
        lsi = torch.as_tensor([0, shapes[0][0] * shapes[0][1]])

        with torch.no_grad():
            out_t = enc_t(
                src=torch.as_tensor(src), pos=torch.as_tensor(pos),
                reference_points=torch.as_tensor(ref),
                spatial_shapes=ss_t, level_start_index=lsi,
            ).numpy()

        sd = {k: v for k, v in enc_t.state_dict().items()}
        pe = {
            "self_attn": gc._msdeform(sd, "self_attn"),
            "norm1": gc._ln(sd, "norm1"),
            "linear1": gc._lin(sd, "linear1"),
            "linear2": gc._lin(sd, "linear2"),
            "norm2": gc._ln(sd, "norm2"),
        }
        out_j = DeformableEncoderLayer(d, heads, L, P, ffn).apply(
            {"params": pe}, jnp.asarray(src), jnp.asarray(pos),
            jnp.asarray(ref), shapes,
        )
        np.testing.assert_allclose(
            np.asarray(out_j), out_t, rtol=2e-4, atol=2e-4
        )

        # ------------------------------------------------- decoder layer
        nq, Nl = 7, 9
        tgt = rng.normal(size=(1, nq, d)).astype(np.float32)
        qpos = rng.normal(size=(1, nq, d)).astype(np.float32)
        text = rng.normal(size=(1, Nl, d)).astype(np.float32)
        tmask = np.ones((1, Nl), bool)
        tmask[0, 7:] = False
        ref4 = rng.uniform(0.2, 0.8, size=(1, nq, 4)).astype(np.float32)
        ref4_l = np.broadcast_to(ref4[:, :, None], (1, nq, L, 4)).copy()

        with torch.no_grad():
            out_t = dec_t(
                tgt=torch.as_tensor(tgt).transpose(0, 1),
                tgt_query_pos=torch.as_tensor(qpos).transpose(0, 1),
                tgt_reference_points=torch.as_tensor(ref4_l).transpose(0, 1),
                memory_text=torch.as_tensor(text),
                text_attention_mask=torch.as_tensor(~tmask),
                memory=torch.as_tensor(src).transpose(0, 1),
                memory_spatial_shapes=ss_t,
                memory_level_start_index=lsi,
            ).transpose(0, 1).numpy()

        sd = {k: v for k, v in dec_t.state_dict().items()}
        pd = {
            "self_attn": gc._mha(sd, "self_attn", d),
            "norm2": gc._ln(sd, "norm2"),
            "ca_text": gc._mha(sd, "ca_text", d),
            "catext_norm": gc._ln(sd, "catext_norm"),
            "cross_attn": gc._msdeform(sd, "cross_attn"),
            "norm1": gc._ln(sd, "norm1"),
            "linear1": gc._lin(sd, "linear1"),
            "linear2": gc._lin(sd, "linear2"),
            "norm3": gc._ln(sd, "norm3"),
        }
        out_j = DeformableDecoderLayer(d, heads, L, P, ffn).apply(
            {"params": pd}, jnp.asarray(tgt), jnp.asarray(qpos),
            jnp.asarray(ref4_l), jnp.asarray(src), shapes,
            jnp.asarray(text), jnp.asarray(tmask),
        )
        np.testing.assert_allclose(
            np.asarray(out_j), out_t, rtol=2e-4, atol=2e-4
        )


class TestGDINOFullModelParity:
    """FULL GroundingDINO forward (reference models/main/groundingdino.py:
    37-380: tokenized caption + image → pred_logits/pred_boxes through
    Swin + BERT + fusion encoder + two-stage query selection + cross-modal
    decoder with iterative box refinement) vs GroundingDINOModel +
    convert_gdino at a reduced-dim config with the released topology
    (two_stage_type='standard', embed_init_tgt, shared bbox head).

    Component-level parity (TestGDINOParity) can miss ASSEMBLY bugs — a
    transposed box head, wrong two-stage top-k source, wrong position
    embedding temperature; this pins the whole call."""

    def test_full_model(self):
        import jax
        import jax.numpy as jnp
        import transformers

        from vipe_tpu.priors.track_anything.gdino import (
            GDINOConfig, GroundingDINOModel,
        )
        from vipe_tpu.priors.track_anything.gdino.bert import (
            BertConfig as JBertConfig,
            generate_special_token_masks, make_tokenizer,
        )
        from vipe_tpu.priors.track_anything.gdino.convert import convert_gdino

        gdm = ref_module(
            "vipe.priors.track_anything.groundingdino.models.main"
            ".groundingdino"
        )
        swm = ref_module(
            "vipe.priors.track_anything.groundingdino.models.main"
            ".backbone.swin_transformer"
        )
        bbm = ref_module(
            "vipe.priors.track_anything.groundingdino.models.main"
            ".backbone.backbone"
        )
        pem = ref_module(
            "vipe.priors.track_anything.groundingdino.models.main"
            ".backbone.position_encoding"
        )
        trm = ref_module(
            "vipe.priors.track_anything.groundingdino.models.main"
            ".transformer"
        )
        misc = ref_module(
            "vipe.priors.track_anything.groundingdino.util.misc"
        )
        gt = ref_module(
            "vipe.priors.track_anything.groundingdino.util.get_tokenlizer"
        )

        # d MUST be 256: the reference hardcodes the text position embed
        # width (transformer.py:536-538 num_pos_feats=256); every other dim
        # is shrunk
        d, heads, ffn, nq, Lcap = 256, 8, 512, 24, 64
        cfg = GDINOConfig(
            hidden_dim=d, nheads=heads, enc_layers=2, dec_layers=2,
            ffn_dim=ffn, num_queries=nq, max_text_len=Lcap,
            swin_embed_dim=16, swin_depths=(1, 1, 1, 1),
            swin_heads=(1, 2, 4, 8), swin_window=4,
            bert=JBertConfig(
                vocab_size=30522, hidden_size=48, num_layers=2, num_heads=4,
                intermediate_size=96, max_position=512,
            ),
        )

        # ------------------- reference model, manually assembled tiny
        torch.manual_seed(0)
        hf_cfg = transformers.BertConfig(
            vocab_size=30522, hidden_size=48, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=96,
            max_position_embeddings=512, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
        )
        bert_t = transformers.BertModel(hf_cfg).eval()
        jtok = make_tokenizer()

        class _Enc(dict):
            def to(self, device):
                return self

            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError as e:
                    raise AttributeError(k) from e

        class _FakeTok:
            def convert_tokens_to_ids(self, toks):
                from vipe_tpu.priors.track_anything.gdino.bert import (
                    CLS_ID, DOT_ID, QMARK_ID, SEP_ID,
                )

                m = {"[CLS]": CLS_ID, "[SEP]": SEP_ID, ".": DOT_ID,
                     "?": QMARK_ID}
                return [m[t] for t in toks]

            def __call__(self, captions, padding=None, return_tensors=None):
                ids = jtok(captions[0])
                return _Enc(
                    input_ids=torch.as_tensor([ids]),
                    attention_mask=torch.ones(1, len(ids), dtype=torch.bool),
                    token_type_ids=torch.zeros(1, len(ids),
                                               dtype=torch.long),
                )

        swin_t = swm.SwinTransformer(
            embed_dim=16, depths=[1, 1, 1, 1], num_heads=[1, 2, 4, 8],
            window_size=4, drop_path_rate=0.0, out_indices=(1, 2, 3),
        )
        swin_t.eval()
        pos_t = pem.PositionEmbeddingSineHW(
            d // 2, temperatureH=20, temperatureW=20, normalize=True
        )
        joiner = bbm.Joiner(swin_t, pos_t)
        joiner.num_channels = [32, 64, 128]
        tr_t = trm.Transformer(
            d_model=d, nhead=heads, num_queries=nq, num_encoder_layers=2,
            num_decoder_layers=2, dim_feedforward=ffn, dropout=0.0,
            activation="relu", normalize_before=False,
            return_intermediate_dec=True, query_dim=4, num_patterns=0,
            num_feature_levels=4, enc_n_points=4, dec_n_points=4,
            learnable_tgt_init=True, two_stage_type="standard",
            embed_init_tgt=True, use_text_enhancer=True,
            use_fusion_layer=True, use_checkpoint=False,
            use_transformer_ckpt=False, use_text_cross_attention=True,
            text_dropout=0.0, fusion_dropout=0.0, fusion_droppath=0.0,
        )
        orig_tok = gt.get_tokenlizer
        orig_lm = gt.get_pretrained_language_model
        gt.get_tokenlizer = lambda t: _FakeTok()
        gt.get_pretrained_language_model = lambda t: bert_t
        try:
            model_t = gdm.GroundingDINO(
                joiner, tr_t, num_queries=nq, aux_loss=False,
                iter_update=True, query_dim=4, num_feature_levels=4,
                nheads=heads, dec_pred_bbox_embed_share=True,
                two_stage_type="standard", two_stage_bbox_embed_share=False,
                two_stage_class_embed_share=False, num_patterns=0,
                dn_number=0, text_encoder_type="bert-base-uncased",
                sub_sentence_present=True, max_text_len=Lcap,
            ).eval()
        finally:
            gt.get_tokenlizer = orig_tok
            gt.get_pretrained_language_model = orig_lm

        caption = "person . car . dog ."
        H, W = 64, 96
        img_t = torch.rand(
            1, 3, H, W, generator=torch.Generator().manual_seed(2)
        )
        # direct NestedTensor (no padding): nested_tensor_from_tensor_list
        # routes through the stubbed torchvision
        samples = misc.NestedTensor(
            img_t, torch.zeros(1, H, W, dtype=torch.bool)
        )
        if not hasattr(samples, "device"):
            samples.device = torch.device("cpu")
        with torch.no_grad():
            out_t = model_t(samples, captions=[caption])
        logits_t = out_t["pred_logits"].numpy()[0]   # (nq, max_text_len)
        boxes_t = out_t["pred_boxes"].numpy()[0]     # (nq, 4) cxcywh

        # ----------------------------------------------------- flax side
        ids = jtok(caption)
        L = len(ids)
        ids_np = np.asarray([ids], np.int64)
        m3, pid = generate_special_token_masks(ids_np)
        tmask = np.ones((1, L), bool)
        variables = convert_gdino(model_t.state_dict(), cfg)
        logits_j, boxes_j = GroundingDINOModel(cfg).apply(
            variables,
            jnp.asarray(img_t.numpy().transpose(0, 2, 3, 1)),
            jnp.asarray(ids_np.astype(np.int32)), jnp.asarray(m3),
            jnp.asarray(pid.astype(np.int32)), jnp.asarray(tmask),
        )
        logits_j = np.asarray(logits_j[0])
        boxes_j = np.asarray(boxes_j[0])

        # queries come from a top-k over encoder scores — compare as SETS
        # ordered by matching rows (top-k tie order is backend-dependent);
        # with random weights scores are distinct, so sort both by score
        def order(logits, boxes):
            key = np.argsort(-logits[:, :L].max(-1), kind="stable")
            return logits[key][:, :L], boxes[key]

        lt, bt = order(logits_t, boxes_t)
        lj, bj = order(logits_j, boxes_j)
        # logits are unnormalized contrastive dots of magnitude ~30; f32
        # accumulation across 2+2 layers leaves ~5e-3 absolute wiggle
        np.testing.assert_allclose(lj, lt, rtol=5e-3, atol=1e-2)
        np.testing.assert_allclose(bj, bt, rtol=2e-3, atol=2e-3)


class TestDeAOTParity:
    """DeAOT R50 (reference vipe/priors/track_anything/aot/networks/) vs
    DeAOTNet + convert_deaot: ResNet-50 encoder, patch-wise id bank,
    DualBranchGPM (reference-frame self-matching AND a propagation step
    against those memories), FPN decoder."""

    def test_deaot_full(self):
        import types as _types

        import jax.numpy as jnp

        deaot_m = ref_module(
            "vipe.priors.track_anything.aot.networks.models.deaot"
        )
        from vipe_tpu.priors.track_anything.deaot.convert import convert_deaot
        from vipe_tpu.priors.track_anything.deaot.network import (
            DeAOTConfig, DeAOTNet,
        )

        ref_cfg = _types.SimpleNamespace(
            MODEL_MAX_OBJ_NUM=10, MODEL_EPSILON=1e-5, MODEL_FREEZE_BN=True,
            TRAIN_ENCODER_FREEZE_AT=2,
            MODEL_ENCODER_DIM=[256, 512, 1024, 1024],
            MODEL_ENCODER_EMBEDDING_DIM=256, MODEL_LSTT_NUM=2,
            MODEL_SELF_HEADS=1, MODEL_ATT_HEADS=1,
            TRAIN_LSTT_EMB_DROPOUT=0.0, TRAIN_LSTT_DROPPATH=0.0,
            TRAIN_LSTT_LT_DROPOUT=0.0, TRAIN_LSTT_ST_DROPOUT=0.0,
            TRAIN_LSTT_DROPPATH_LST=False, TRAIN_LSTT_DROPPATH_SCALING=False,
            MODEL_DECODER_INTERMEDIATE_LSTT=False, MODEL_ALIGN_CORNERS=True,
            TRAIN_LSTT_ID_DROPOUT=0.0,
        )
        torch.manual_seed(0)
        net_t = deaot_m.DeAOT(ref_cfg, encoder="resnet50")
        net_t.eval()
        # the CUDA SpatialCorrelationSampler isn't available — force the
        # reference's own unfold fallback (attention.py:821-831)
        for layer in net_t.LSTT.layers:
            layer.short_term_attn.enable_corr = False
        # perturb FrozenBN running stats away from identity
        with torch.no_grad():
            for name, buf in net_t.named_buffers():
                if "running" in name:
                    buf.add_(torch.randn_like(buf) * 0.05)

        H = W = 64
        h = w = H // 16
        gen = torch.Generator().manual_seed(1)
        img_t = torch.randn(1, 3, H, W, generator=gen)
        img2_t = torch.randn(1, 3, H, W, generator=gen)
        onehot = torch.zeros(1, 11, H, W)
        onehot[0, 0, :, : W // 2] = 1.0
        onehot[0, 1, :, W // 2:] = 1.0

        with torch.no_grad():
            xs_t = net_t.encode_image(img_t)
            id_t = net_t.get_id_emb(onehot)  # (1, 256, h, w)
            id_seq_t = id_t.view(1, 256, h * w).permute(2, 0, 1)
            embs_t, currs_t, longs_t, shorts_t = net_t.LSTT_forward(
                xs_t, None, None, curr_id_emb=id_seq_t, pos_emb=None,
                size_2d=(h, w),
            )
            logits_t = net_t.decode_id_logits(embs_t, xs_t)

            # propagation: second frame against the ref-frame memories
            xs2_t = net_t.encode_image(img2_t)
            embs2_t, _, _, _ = net_t.LSTT_forward(
                xs2_t, list(longs_t), list(shorts_t), curr_id_emb=None,
                pos_emb=None, size_2d=(h, w),
            )
            logits2_t = net_t.decode_id_logits(embs2_t, xs2_t)

        cfg_j = DeAOTConfig(lstt_num=2)
        sd = {k: v.numpy() for k, v in net_t.state_dict().items()}
        params = convert_deaot(sd, cfg_j)
        net_j = DeAOTNet(cfg_j)

        def t2j(t):
            return jnp.asarray(t.numpy().transpose(0, 2, 3, 1))

        xs_j = net_j.apply(params, t2j(img_t), method="encode_image")
        for xj, xt in zip(xs_j, xs_t):
            np.testing.assert_allclose(
                np.asarray(xj).transpose(0, 3, 1, 2), xt.numpy(),
                rtol=2e-3, atol=2e-4,
            )

        id_j = net_j.apply(params, t2j(onehot), method="get_id_emb")
        np.testing.assert_allclose(
            np.asarray(id_j), id_seq_t.numpy(), rtol=2e-3, atol=2e-4
        )

        outs_j, mems_j = net_j.apply(
            params, [t2j(x) for x in xs_t],
            None, jnp.asarray(id_seq_t.numpy()), None, (h, w),
            method="lstt_forward",
        )
        np.testing.assert_allclose(
            np.asarray(outs_j[-1]), embs_t[-1].numpy(), rtol=2e-3, atol=5e-4
        )
        logits_j = net_j.apply(
            params, outs_j[-1], [t2j(x) for x in xs_t], (h, w),
            method="decode_logits",
        )
        np.testing.assert_allclose(
            np.asarray(logits_j).transpose(0, 3, 1, 2), logits_t.numpy(),
            rtol=2e-3, atol=1e-3,
        )

        # propagation step: memories from the reference triple layout
        mem_dicts = []
        for lt, st in zip(longs_t, shorts_t):
            mem_dicts.append({
                "global_K": jnp.asarray(lt[0].numpy()),
                "global_V": jnp.asarray(lt[1].numpy()),
                "global_ID_V": jnp.asarray(lt[3].numpy()),
                "local_K": t2j(st[0]),
                "local_V": t2j(st[1]),
                "local_ID_V": t2j(st[3]),
            })
        outs2_j, _ = net_j.apply(
            params, [t2j(x) for x in xs2_t], mem_dicts, None, None, (h, w),
            method="lstt_forward",
        )
        np.testing.assert_allclose(
            np.asarray(outs2_j[-1]), embs2_t[-1].numpy(),
            rtol=2e-3, atol=5e-4,
        )
        logits2_j = net_j.apply(
            params, outs2_j[-1], [t2j(x) for x in xs2_t], (h, w),
            method="decode_logits",
        )
        np.testing.assert_allclose(
            np.asarray(logits2_j).transpose(0, 3, 1, 2), logits2_t.numpy(),
            rtol=2e-3, atol=1e-3,
        )


class TestVDATemporalParity:
    """VideoDepthAnything TemporalModule (reference videodepthanything/
    motion_module/motion_module.py:28-145) vs models/temporal.py
    TemporalModule + convert_vda_motion."""

    def test_temporal_module(self):
        import jax.numpy as jnp

        m = ref_module(
            "vipe.priors.depth.videodepthanything.motion_module.motion_module"
        )
        from vipe_tpu.models.convert import convert_vda_motion
        from vipe_tpu.models.temporal import TemporalModule

        torch.manual_seed(0)
        C, T, H, W = 64, 4, 6, 8
        mod_t = m.TemporalModule(
            in_channels=C, num_attention_heads=8, num_transformer_block=1,
            num_attention_blocks=2, norm_num_groups=32, temporal_max_len=8,
            zero_initialize=True, pos_embedding_type="ape",
        ).eval()
        with torch.no_grad():  # proj_out is zero-init; make it nontrivial
            tt = mod_t.temporal_transformer
            tt.proj_out.weight.add_(torch.randn_like(tt.proj_out.weight) * 0.1)
            tt.proj_out.bias.add_(torch.randn_like(tt.proj_out.bias) * 0.1)

        gen = torch.Generator().manual_seed(1)
        x_t = torch.randn(1, C, T, H, W, generator=gen)
        with torch.no_grad():
            out_t = mod_t(x_t, encoder_hidden_states=None)

        sd = {k: v.numpy() for k, v in mod_t.state_dict().items()}
        params = convert_vda_motion(sd, "temporal_transformer")
        mod_j = TemporalModule(channels=C, heads=8, num_layers=1,
                               num_attention_blocks=2, max_len=8)
        # (1, C, T, H, W) → (T, H, W, C) = the flax (B·T, H, W, C) layout
        x_j = jnp.asarray(x_t.numpy()[0].transpose(1, 2, 3, 0))
        out_j = mod_j.apply({"params": params}, x_j, T)
        np.testing.assert_allclose(
            np.asarray(out_j).transpose(3, 0, 1, 2),
            out_t.numpy()[0], rtol=2e-4, atol=2e-4,
        )


class TestPriorDAFineParity:
    """PriorDA's conditioned refinement net (reference priorda/dav2 —
    DepthAnythingV2 with a 3-channel condition added through a zero-init
    patch projection, patch_embed.py:71-94) vs DepthAnythingV2Net(cond_dim=3)
    + convert_dav2."""

    def test_conditioned_forward(self):
        import jax.numpy as jnp

        m = ref_module("vipe.priors.depth.priorda.dav2")
        from vipe_tpu.models import convert as mconvert
        from vipe_tpu.priors.depth.dav2 import DepthAnythingV2Net

        torch.manual_seed(0)
        # build_backbone insists on a checkpoint; construct directly and
        # apply the same post-load surgery (init_state_dict, dpt.py:235-245)
        net_t = m.DepthAnythingV2(
            **m.model_configs["vits"], encoder_cond_dim=3
        ).eval()
        net_t.pretrained.patch_embed.init_alpha_conv(cond_channels=3)
        with torch.no_grad():  # alpha_proj is zero-init; make it nontrivial
            ap = net_t.pretrained.patch_embed.alpha_proj
            ap.weight.add_(torch.randn_like(ap.weight) * 0.05)
            ap.bias.add_(torch.randn_like(ap.bias) * 0.05)

        H = W = 56
        gen = torch.Generator().manual_seed(1)
        x_t = torch.randn(1, 3, H, W, generator=gen) * 0.5
        cond_t = torch.randn(1, 3, H, W, generator=gen) * 0.5
        with torch.no_grad():
            feats = net_t.pretrained.get_intermediate_layers(
                x_t, net_t.intermediate_layer_idx["vits"],
                return_class_token=True, condition=cond_t,
            )
            disp_t = torch.relu(
                net_t.depth_head(feats, H // 14, W // 14, condition=cond_t)
            ).squeeze(1).numpy()

        sd = {k: v for k, v in net_t.state_dict().items()}
        params = mconvert.convert_dav2(sd)
        net_j = DepthAnythingV2Net("vits", max_depth=None, params=params,
                                   cond_dim=3)
        disp_j = net_j(
            jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1)),
            jnp.asarray(cond_t.numpy().transpose(0, 2, 3, 1)),
        )
        np.testing.assert_allclose(
            np.asarray(disp_j), disp_t, rtol=2e-3, atol=2e-4
        )


class TestDPTHeadParity:
    """DAv2's DPTHead (reference vipe/priors/depth/dav2/dpt.py:44-190) vs
    models/dpt.py DPTHead + convert_dpt_head."""

    @pytest.mark.parametrize("is_metric", [False, True])
    def test_head(self, is_metric):
        import jax.numpy as jnp

        from vipe_tpu.models import convert as mconvert
        from vipe_tpu.models.dpt import DPTHead

        m = ref_module("vipe.priors.depth.dav2.dpt")
        torch.manual_seed(0)
        D, feats, out_ch = 64, 32, (24, 48, 96, 96)
        head_t = m.DPTHead(
            D, features=feats, out_channels=list(out_ch),
            use_clstoken=False, is_metric=is_metric,
        ).eval()
        # random-init relu disparity is all-zero (negative pre-activation
        # everywhere) — shift the final bias so the comparison is non-trivial
        with torch.no_grad():
            head_t.scratch.output_conv2[2].bias += 0.05

        B, ph, pw = 1, 6, 8
        gen = torch.Generator().manual_seed(1)
        taps_t = [
            (torch.randn(B, ph * pw, D, generator=gen) * 0.5,
             torch.randn(B, D, generator=gen))
            for _ in range(4)
        ]
        with torch.no_grad():
            out_t = head_t(taps_t, ph, pw).numpy()[:, 0]  # (B, H, W)

        head_j = DPTHead(
            features=feats, out_channels=out_ch, is_metric=is_metric,
        )
        params = mconvert.convert_dpt_head(head_t.state_dict(), prefix="")
        taps_j = [
            (jnp.asarray(p.numpy()), jnp.asarray(c.numpy()))
            for p, c in taps_t
        ]
        out_j = np.asarray(head_j.apply(params, taps_j, ph, pw))
        np.testing.assert_allclose(out_j, out_t, rtol=2e-4, atol=2e-4)
