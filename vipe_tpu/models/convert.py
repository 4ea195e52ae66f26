"""Torch-checkpoint → flax-param conversion for the model zoo.

The reference auto-downloads ``droid.pth`` from Google Drive
(/root/reference/vipe/slam/networks/droid_net.py:529-552).  This module
converts such a torch ``state_dict`` (loaded via torch CPU, or a pre-exported
``.npz``) into the flax param tree of ``vipe_tpu.models.droidnet.DroidNet``.
In environments without the checkpoint, models run with random init; the
converter is exercised by tests through a synthetic state_dict.

Conv weight layout: torch ``(O, I, kh, kw)`` → flax ``(kh, kw, I, O)``.
The delta/weight heads are sliced to their first 2 output channels exactly
like the reference loader (droid_net.py:547-550).
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def _conv(w):
    return np.transpose(np.asarray(w, np.float32), (2, 3, 1, 0))


def _encoder_entries(prefix: str, out: dict, sd: Mapping, dst: dict):
    dst[f"conv1"] = {"kernel": _conv(sd[f"{prefix}.conv1.weight"]),
                     "bias": np.asarray(sd[f"{prefix}.conv1.bias"], np.float32)}
    for stage in (1, 2, 3):
        for blk in (0, 1):
            t = f"{prefix}.layer{stage}.{blk}"
            d = {}
            d["conv1"] = {"kernel": _conv(sd[f"{t}.conv1.weight"]),
                          "bias": np.asarray(sd[f"{t}.conv1.bias"], np.float32)}
            d["conv2"] = {"kernel": _conv(sd[f"{t}.conv2.weight"]),
                          "bias": np.asarray(sd[f"{t}.conv2.bias"], np.float32)}
            if f"{t}.downsample.0.weight" in sd:
                d["downsample"] = {
                    "kernel": _conv(sd[f"{t}.downsample.0.weight"]),
                    "bias": np.asarray(sd[f"{t}.downsample.0.bias"], np.float32),
                }
            dst[f"layer{stage}_{blk}"] = d
    dst["conv2"] = {"kernel": _conv(sd[f"{prefix}.conv2.weight"]),
                    "bias": np.asarray(sd[f"{prefix}.conv2.bias"], np.float32)}


def convert_droidnet(state_dict: Mapping) -> dict:
    """Build the flax ``{"params": ...}`` tree from a droid.pth state_dict.

    Accepts tensors or numpy arrays; keys may carry a leading ``module.``.
    """
    sd = {k.removeprefix("module."): _to_np(v) for k, v in state_dict.items()}

    fnet: dict = {}
    cnet: dict = {}
    _encoder_entries("fnet", {}, sd, fnet)
    _encoder_entries("cnet", {}, sd, cnet)

    def conv_entry(key, slice_out=None):
        w = sd[f"{key}.weight"]
        b = sd[f"{key}.bias"]
        if slice_out is not None:
            w = w[:slice_out]
            b = b[:slice_out]
        return {"kernel": _conv(w), "bias": np.asarray(b, np.float32)}

    update = {
        "corr_enc1": conv_entry("update.corr_encoder.0"),
        "corr_enc2": conv_entry("update.corr_encoder.2"),
        "flow_enc1": conv_entry("update.flow_encoder.0"),
        "flow_enc2": conv_entry("update.flow_encoder.2"),
        "weight1": conv_entry("update.weight.0"),
        "weight2": conv_entry("update.weight.2", slice_out=2),
        "delta1": conv_entry("update.delta.0"),
        "delta2": conv_entry("update.delta.2", slice_out=2),
        "gru": {
            n: conv_entry(f"update.gru.{n}")
            for n in ("convz", "convr", "convq", "w", "convz_glo", "convr_glo", "convq_glo")
        },
        "agg": {
            "conv1": conv_entry("update.agg.conv1"),
            "conv2": conv_entry("update.agg.conv2"),
            "eta": conv_entry("update.agg.eta.0"),
        },
    }
    return {"params": {"fnet": fnet, "cnet": cnet, "update": update}}


def _to_np(v):
    if hasattr(v, "detach"):
        return v.detach().cpu().numpy()
    return np.asarray(v)


def load_droidnet_checkpoint(path: str) -> dict | None:
    """Load droid.pth (torch) or droid.npz (pre-exported) if present."""
    import os

    if not os.path.exists(path):
        return None
    if path.endswith(".npz"):
        return convert_droidnet(dict(np.load(path)))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return convert_droidnet(sd)


# ---------------------------------------------------------------------------
# DINOv2 ViT + DPT (DepthAnythingV2 family)
# ---------------------------------------------------------------------------


def _lin(sd, key):
    return {"kernel": np.asarray(sd[f"{key}.weight"], np.float32).T,
            "bias": np.asarray(sd[f"{key}.bias"], np.float32)}


def _ln(sd, key):
    return {"scale": np.asarray(sd[f"{key}.weight"], np.float32),
            "bias": np.asarray(sd[f"{key}.bias"], np.float32)}


def _convt(sd, key):
    """torch ConvTranspose2d (I, O, kh, kw) → flax ConvTranspose (kh, kw, I, O).

    torch's transposed conv scatters the kernel spatially FLIPPED relative to
    flax's default (transpose_kernel=False) formulation, so the spatial axes
    must be reversed before the layout transpose or outputs come out mirrored
    within each stride block (verified numerically in
    tests/test_convert_parity.py)."""
    w = np.asarray(sd[f"{key}.weight"], np.float32)
    out = {"kernel": np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1))}
    if f"{key}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{key}.bias"], np.float32)
    return out


def convert_dinov2_vit(sd: Mapping, prefix: str = "pretrained") -> dict:
    """torch DINOv2 state_dict → flax DinoViT params (models/vit.py)."""
    sd = {k.removeprefix("module."): _to_np(v) for k, v in sd.items()}
    pf = f"{prefix}." if prefix else ""
    p: dict = {}
    p["patch_embed"] = _conv_entry(sd, f"{pf}patch_embed.proj")
    if f"{pf}patch_embed.alpha_proj.weight" in sd:
        # PriorDA conditioned encoder (patch_embed.py:71-94)
        p["alpha_proj"] = _conv_entry(sd, f"{pf}patch_embed.alpha_proj")
    if f"{pf}register_tokens" in sd:
        # DINOv2-reg variants (Metric3D backbones)
        p["register_tokens"] = np.asarray(
            sd[f"{pf}register_tokens"], np.float32
        )
    p["cls_token"] = np.asarray(sd[f"{pf}cls_token"], np.float32)
    p["pos_embed"] = np.asarray(sd[f"{pf}pos_embed"], np.float32)
    p["norm"] = _ln(sd, f"{pf}norm")
    i = 0
    while f"{pf}blocks.{i}.norm1.weight" in sd:
        b = f"{pf}blocks.{i}"
        p[f"block{i}"] = {
            "norm1": _ln(sd, f"{b}.norm1"),
            "attn": {"qkv": _lin(sd, f"{b}.attn.qkv"),
                     "proj": _lin(sd, f"{b}.attn.proj")},
            "ls1": {"gamma": np.asarray(sd[f"{b}.ls1.gamma"], np.float32)},
            "norm2": _ln(sd, f"{b}.norm2"),
            "mlp": {"fc1": _lin(sd, f"{b}.mlp.fc1"),
                    "fc2": _lin(sd, f"{b}.mlp.fc2")},
            "ls2": {"gamma": np.asarray(sd[f"{b}.ls2.gamma"], np.float32)},
        }
        i += 1
    return {"params": p}


def _conv_entry(sd, key, slice_out=None):
    w = sd[f"{key}.weight"]
    if slice_out is not None:
        w = w[:slice_out]
    out = {"kernel": _conv(w)}
    if f"{key}.bias" in sd:
        b = sd[f"{key}.bias"]
        if slice_out is not None:
            b = b[:slice_out]
        out["bias"] = np.asarray(b, np.float32)
    return out


def convert_dpt_head(sd: Mapping, prefix: str = "depth_head") -> dict:
    """torch DAv2 DPTHead state_dict → flax DPTHead params (models/dpt.py)."""
    sd = {k.removeprefix("module."): _to_np(v) for k, v in sd.items()}
    pf = f"{prefix}." if prefix else ""
    p: dict = {}
    for i in range(4):
        p[f"project{i}"] = _conv_entry(sd, f"{pf}projects.{i}")
        p[f"layer{i + 1}_rn"] = _conv_entry(sd, f"{pf}scratch.layer{i + 1}_rn")
    p["resize0"] = _convt(sd, f"{pf}resize_layers.0")
    p["resize1"] = _convt(sd, f"{pf}resize_layers.1")
    p["resize3"] = _conv_entry(sd, f"{pf}resize_layers.3")
    for r in range(1, 5):
        rn = f"{pf}scratch.refinenet{r}"
        entry = {
            "rcu2": {"conv1": _conv_entry(sd, f"{rn}.resConfUnit2.conv1"),
                     "conv2": _conv_entry(sd, f"{rn}.resConfUnit2.conv2")},
            "out_conv": _conv_entry(sd, f"{rn}.out_conv"),
        }
        if r != 4:
            # refinenet4 has no skip input; its (never-used) torch
            # resConfUnit1 weights have no flax counterpart
            entry["rcu1"] = {
                "conv1": _conv_entry(sd, f"{rn}.resConfUnit1.conv1"),
                "conv2": _conv_entry(sd, f"{rn}.resConfUnit1.conv2"),
            }
        p[f"refinenet{r}"] = entry
    p["output_conv1"] = _conv_entry(sd, f"{pf}scratch.output_conv1")
    p["output_conv2_0"] = _conv_entry(sd, f"{pf}scratch.output_conv2.0")
    p["output_conv2_2"] = _conv_entry(sd, f"{pf}scratch.output_conv2.2")
    return {"params": p}


def convert_dav2(state_dict: Mapping) -> dict:
    """Full DepthAnythingV2 checkpoint → {"vit": ..., "head": ...}."""
    return {
        "vit": convert_dinov2_vit(state_dict, "pretrained"),
        "head": convert_dpt_head(state_dict, "depth_head"),
    }


def load_dav2_checkpoint(path: str, variant: str):
    import os

    if not os.path.exists(path):
        return None
    if path.endswith(".npz"):
        return convert_dav2(dict(np.load(path)))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return convert_dav2(sd)


def convert_metric3d_decoder(sd: Mapping, prefix: str = "decoder") -> dict:
    """torch RAFTDepthNormalDPT5 state_dict → flax Metric3DDecoder params
    (reference metric3d/model/decode_heads/RAFTDepthNormalDPTDecoder5.py
    :900-1325; module attribute names mirrored 1:1)."""
    sd = {k.removeprefix("module."): _to_np(v) for k, v in sd.items()}
    pf = f"{prefix}." if prefix else ""
    p: dict = {}

    def readout(base):
        return {
            "project_patch": _lin(sd, f"{base}.readoper.project_patch"),
            "project_learn": {
                "kernel": np.transpose(np.asarray(
                    sd[f"{base}.readoper.project_learn.weight"], np.float32))
            },
        }

    # EncoderFeature reads: scales 1, 1, 2(ConvT), 3.5(nearest + conv-in-seq)
    for i in (2, 3):
        p[f"read_{i}"] = {"readoper": readout(f"{pf}token2feature.read_{i}")}
    p["read_1"] = {
        "readoper": readout(f"{pf}token2feature.read_1"),
        "sample": _convt(sd, f"{pf}token2feature.read_1.sample"),
    }
    p["read_0"] = {
        "readoper": readout(f"{pf}token2feature.read_0"),
        "sample": _conv_entry(sd, f"{pf}token2feature.read_0.sample.0"),
    }

    def conv_block(base):
        return {"conv1": _conv_entry(sd, f"{base}.conv1"),
                "conv2": _conv_entry(sd, f"{base}.conv2")}

    for name, has_branch in (("upconv_3", False), ("upconv_2", True),
                             ("upconv_1", True)):
        base = f"{pf}decoder_mono.{name}"
        entry = {
            "way_trunk": conv_block(f"{base}.way_trunk"),
            "out_conv": _conv_entry(sd, f"{base}.out_conv"),
        }
        if has_branch:
            entry["way_branch"] = conv_block(f"{base}.way_branch")
        p[name] = entry

    p["depth_regressor_0"] = _conv_entry(sd, f"{pf}depth_regressor.0")
    p["depth_regressor_2"] = _conv_entry(sd, f"{pf}depth_regressor.2")
    for k in (0, 2, 4, 6):
        p[f"normal_predictor_{k}"] = _conv_entry(
            sd, f"{pf}normal_predictor.{k}"
        )

    def ctx_out(base):
        entry = {
            "res": {
                "conv1": _conv_entry(sd, f"{base}.0.conv1"),
                "norm1": _ln(sd, f"{base}.0.norm1"),
                "conv2": _conv_entry(sd, f"{base}.0.conv2"),
                "norm2": _ln(sd, f"{base}.0.norm2"),
            },
            "conv": _conv_entry(sd, f"{base}.1"),
        }
        if f"{base}.0.downsample.0.weight" in sd:
            entry["res"]["downsample"] = _conv_entry(
                sd, f"{base}.0.downsample.0"
            )
            entry["res"]["norm3"] = _ln(sd, f"{base}.0.norm3")
        return entry

    for lvl, tag in enumerate(("04", "08", "16")):
        base = f"{pf}context_feature_encoder.outputs{tag}"
        p[f"outputs{tag}_0"] = ctx_out(f"{base}.0")
        p[f"outputs{tag}_1"] = ctx_out(f"{base}.1")
        p[f"context_zqr_convs_{lvl}"] = _conv_entry(
            sd, f"{pf}context_zqr_convs.{lvl}"
        )

    ub = f"{pf}update_block"
    p["update_block"] = {
        **{g: {c: _conv_entry(sd, f"{ub}.{g}.{c}")
               for c in ("convz", "convr", "convq")}
           for g in ("gru08", "gru16", "gru32")},
        "flow_head": {c: _conv_entry(sd, f"{ub}.flow_head.{c}")
                      for c in ("conv1d", "conv2d", "conv1n", "conv2n")},
        "mask0": _conv_entry(sd, f"{ub}.mask.0"),
        "mask2": _conv_entry(sd, f"{ub}.mask.2"),
    }
    return {"params": p}


def convert_metric3d(state_dict: Mapping,
                     encoder_prefix: str = "depth_model.encoder",
                     decoder_prefix: str = "depth_model.decoder") -> dict:
    """Full Metric3D checkpoint → {"vit": ..., "decoder": ...}."""
    return {
        "vit": convert_dinov2_vit(state_dict, encoder_prefix),
        "decoder": convert_metric3d_decoder(state_dict, decoder_prefix),
    }


def convert_sam(sd: Mapping) -> dict:
    """Meta segment-anything checkpoint → flax SamPredictor params
    ({"encoder", "prompt", "decoder"}; vipe_tpu/priors/track_anything/sam.py,
    reference vendored SAM under vipe/priors/track_anything/sam/)."""
    sd = {k.removeprefix("module."): _to_np(v) for k, v in sd.items()}
    enc: dict = {}
    e = "image_encoder"
    enc["patch_embed"] = _conv_entry(sd, f"{e}.patch_embed.proj")
    enc["pos_embed"] = np.asarray(sd[f"{e}.pos_embed"], np.float32)
    i = 0
    while f"{e}.blocks.{i}.norm1.weight" in sd:
        b = f"{e}.blocks.{i}"
        enc[f"block{i}"] = {
            "norm1": _ln(sd, f"{b}.norm1"),
            "attn": {
                "qkv": _lin(sd, f"{b}.attn.qkv"),
                "proj": _lin(sd, f"{b}.attn.proj"),
                "rel_pos_h": np.asarray(sd[f"{b}.attn.rel_pos_h"], np.float32),
                "rel_pos_w": np.asarray(sd[f"{b}.attn.rel_pos_w"], np.float32),
            },
            "norm2": _ln(sd, f"{b}.norm2"),
            "mlp_lin1": _lin(sd, f"{b}.mlp.lin1"),
            "mlp_lin2": _lin(sd, f"{b}.mlp.lin2"),
        }
        i += 1
    enc["neck_conv1"] = _conv_entry(sd, f"{e}.neck.0")
    enc["neck_ln1"] = _ln(sd, f"{e}.neck.1")
    enc["neck_conv2"] = _conv_entry(sd, f"{e}.neck.2")
    enc["neck_ln2"] = _ln(sd, f"{e}.neck.3")

    pr = "prompt_encoder"
    prompt = {
        "pe_gaussian": np.asarray(
            sd[f"{pr}.pe_layer.positional_encoding_gaussian_matrix"],
            np.float32,
        ),
        # point_embeddings 2/3 are the box-corner embeddings (the flax
        # predictor is box-prompted)
        "point_embed_2": np.asarray(
            sd[f"{pr}.point_embeddings.2.weight"], np.float32)[0],
        "point_embed_3": np.asarray(
            sd[f"{pr}.point_embeddings.3.weight"], np.float32)[0],
        "no_mask_embed": np.asarray(
            sd[f"{pr}.no_mask_embed.weight"], np.float32)[0],
    }

    d = "mask_decoder"

    def twoway(base):
        return {k: _lin(sd, f"{base}.{k}_proj")
                for k in ("q", "k", "v")} | {"out_proj": _lin(sd, f"{base}.out_proj")}

    def twoway_named(base):
        t = twoway(base)
        return {"q_proj": t["q"], "k_proj": t["k"], "v_proj": t["v"],
                "out_proj": t["out_proj"]}

    dec: dict = {
        "iou_token": np.asarray(sd[f"{d}.iou_token.weight"], np.float32),
        "mask_tokens": np.asarray(sd[f"{d}.mask_tokens.weight"], np.float32),
    }
    for i in range(2):
        b = f"{d}.transformer.layers.{i}"
        dec[f"layer{i}"] = {
            "self_attn": twoway_named(f"{b}.self_attn"),
            "norm1": _ln(sd, f"{b}.norm1"),
            "cross_attn_t2i": twoway_named(f"{b}.cross_attn_token_to_image"),
            "norm2": _ln(sd, f"{b}.norm2"),
            "mlp_lin1": _lin(sd, f"{b}.mlp.lin1"),
            "mlp_lin2": _lin(sd, f"{b}.mlp.lin2"),
            "norm3": _ln(sd, f"{b}.norm3"),
            "cross_attn_i2t": twoway_named(f"{b}.cross_attn_image_to_token"),
            "norm4": _ln(sd, f"{b}.norm4"),
        }
    dec["final_attn"] = twoway_named(
        f"{d}.transformer.final_attn_token_to_image"
    )
    dec["norm_final"] = _ln(sd, f"{d}.transformer.norm_final_attn")
    dec["upscale1"] = _convt(sd, f"{d}.output_upscaling.0")
    dec["upscale_ln"] = _ln(sd, f"{d}.output_upscaling.1")
    dec["upscale2"] = _convt(sd, f"{d}.output_upscaling.3")
    for k in range(4):
        for j in range(3):
            dec[f"hyper{k}_lin{j}"] = _lin(
                sd, f"{d}.output_hypernetworks_mlps.{k}.layers.{j}"
            )
    for j in range(3):
        dec[f"iou_lin{j}"] = _lin(sd, f"{d}.iou_prediction_head.layers.{j}")

    mask_prompt = {
        "conv1": _conv_entry(sd, f"{pr}.mask_downscaling.0"),
        "ln1": _ln(sd, f"{pr}.mask_downscaling.1"),
        "conv2": _conv_entry(sd, f"{pr}.mask_downscaling.3"),
        "ln2": _ln(sd, f"{pr}.mask_downscaling.4"),
        "conv3": _conv_entry(sd, f"{pr}.mask_downscaling.6"),
    }

    return {"encoder": {"params": enc}, "prompt": {"params": prompt},
            "decoder": {"params": dec},
            "mask_prompt": {"params": mask_prompt}}


def convert_vda_motion(sd: Mapping, t: str) -> dict:
    """One TemporalModule's temporal_transformer (reference
    motion_module.py:68-145) → flax models/temporal.py TemporalModule params.
    ``t`` is the torch key prefix of the TemporalTransformer3DModel."""
    blocks = {}
    li = 0
    while f"{t}.transformer_blocks.{li}.ff_norm.weight" in sd:
        b = f"{t}.transformer_blocks.{li}"
        entry = {}
        ai = 0
        while f"{b}.attention_blocks.{ai}.to_q.weight" in sd:
            a = f"{b}.attention_blocks.{ai}"
            entry[f"attn{ai}"] = {
                "to_q": {"kernel": np.asarray(
                    sd[f"{a}.to_q.weight"], np.float32).T},
                "to_k": {"kernel": np.asarray(
                    sd[f"{a}.to_k.weight"], np.float32).T},
                "to_v": {"kernel": np.asarray(
                    sd[f"{a}.to_v.weight"], np.float32).T},
                "to_out": _lin(sd, f"{a}.to_out.0"),
            }
            entry[f"norm{ai}"] = _ln(sd, f"{b}.norms.{ai}")
            ai += 1
        entry["ff_norm"] = _ln(sd, f"{b}.ff_norm")
        entry["ff_geglu"] = {"proj": _lin(sd, f"{b}.ff.net.0.proj")}
        entry["ff_out"] = _lin(sd, f"{b}.ff.net.2")
        blocks[f"block{li}"] = entry
        li += 1
    return {
        "norm": _ln(sd, f"{t}.norm"),
        "proj_in": _lin(sd, f"{t}.proj_in"),
        **blocks,
        "proj_out": _lin(sd, f"{t}.proj_out"),
    }


def convert_vda(sd: Mapping) -> dict:
    """VideoDepthAnything checkpoint → flax {"vit", "head"} params
    (vipe_tpu/priors/depth/videodepthanything.py + models/temporal.py;
    reference videodepthanything/dpt_temporal.py + motion_module/)."""
    sd = {k.removeprefix("module."): _to_np(v) for k, v in sd.items()}
    head = convert_dpt_head(sd, "head")["params"]

    for m in range(4):
        head[f"motion{m}"] = convert_vda_motion(
            sd, f"head.motion_modules.{m}.temporal_transformer"
        )

    return {
        "vit": convert_dinov2_vit(sd, "pretrained"),
        "head": {"params": head},
    }


def _mlp_ud(sd, base):
    return {"norm": _ln(sd, f"{base}.norm"),
            "proj1": _lin(sd, f"{base}.proj1"),
            "proj2": _lin(sd, f"{base}.proj2")}


def _attn_block_ud(sd, base, use_bias=True, layer_scale=True):
    def lin(key):
        e = {"kernel": np.asarray(sd[f"{key}.weight"], np.float32).T}
        if use_bias:
            e["bias"] = np.asarray(sd[f"{key}.bias"], np.float32)
        return e

    entry = {
        "norm_attnx": _ln(sd, f"{base}.norm_attnx"),
        "norm_attnctx": _ln(sd, f"{base}.norm_attnctx"),
        "kv": lin(f"{base}.kv"),
        "q": lin(f"{base}.q"),
        "out": lin(f"{base}.out"),
        "mlp": _mlp_ud(sd, f"{base}.mlp"),
    }
    if layer_scale:
        entry["ls1_gamma"] = np.asarray(sd[f"{base}.ls1.gamma"], np.float32)
        entry["ls2_gamma"] = np.asarray(sd[f"{base}.ls2.gamma"], np.float32)
    return entry


def convert_unidepth_decoder(sd: Mapping,
                             prefix: str = "pixel_decoder") -> dict:
    """torch UniDepthV2 Decoder state_dict → flax UniDepthDecoder params
    (reference models/unidepthv2/decoder.py:40-529; the unused
    ``level_embeds`` buffer and per-level pos embeds have no flax
    counterpart — the forward never consumes them)."""
    sd = {k.removeprefix("module."): _to_np(v) for k, v in sd.items()}
    pf = f"{prefix}." if prefix else ""
    p: dict = {}
    i = 0
    while f"{pf}input_adapter.input_adapters.{i}.weight" in sd:
        p[f"input_adapter{i}"] = _lin(
            sd, f"{pf}input_adapter.input_adapters.{i}"
        )
        p[f"camera_token_adapter{i}"] = _lin(
            sd, f"{pf}camera_token_adapter.input_adapters.{i}"
        )
        i += 1
    n_levels = i

    cl = f"{pf}camera_layer"
    p["camera_layer"] = {
        "latents_pos": np.asarray(sd[f"{cl}.latents_pos"], np.float32),
        "project": _mlp_ud(sd, f"{cl}.project"),
        "aggregate1": _attn_block_ud(sd, f"{cl}.aggregate1", use_bias=False),
        "aggregate2": _attn_block_ud(sd, f"{cl}.aggregate2", use_bias=False),
        "out_pinhole": _mlp_ud(sd, f"{cl}.out_pinhole"),
    }

    dl = f"{pf}depth_layer"
    depth_layer: dict = {"to_latents": _lin(sd, f"{dl}.to_latents")}
    for lvl in range(n_levels):
        depth_layer[f"prompt_camera{lvl}"] = {
            "block0": _attn_block_ud(
                sd, f"{dl}.prompt_camera.{lvl}.layers.0",
                use_bias=False, layer_scale=False,
            )
        }
    stage = 0
    while f"{dl}.process_features.{stage}.weight" in sd:
        depth_layer[f"process_features{stage}"] = _convt(
            sd, f"{dl}.process_features.{stage}"
        )
        ups: dict = {}
        j = 0
        while f"{dl}.ups.{stage}.convs.{j}.conv1.weight" in sd:
            ups[f"rcu{j}"] = {
                "conv1": _conv_entry(sd, f"{dl}.ups.{stage}.convs.{j}.conv1"),
                "conv2": _conv_entry(sd, f"{dl}.ups.{stage}.convs.{j}.conv2"),
                "gamma": np.asarray(
                    sd[f"{dl}.ups.{stage}.convs.{j}.gamma"], np.float32
                ).reshape(-1),
            }
            j += 1
        ups["up_conv"] = _conv_entry(sd, f"{dl}.ups.{stage}.up.0")
        depth_layer[f"ups{stage}"] = ups
        stage += 1
    last = stage - 1
    depth_layer["depth_mlp_norm"] = _ln(sd, f"{dl}.depth_mlp.{last}.0")
    depth_layer["depth_mlp_lin"] = _lin(sd, f"{dl}.depth_mlp.{last}.1")
    depth_layer["confidence_mlp_norm"] = _ln(sd, f"{dl}.confidence_mlp.0")
    depth_layer["confidence_mlp_lin"] = _lin(sd, f"{dl}.confidence_mlp.1")
    depth_layer["to_depth_lr"] = _conv_entry(sd, f"{dl}.to_depth_lr")
    depth_layer["to_depth_hr0"] = _conv_entry(sd, f"{dl}.to_depth_hr.0")
    depth_layer["to_depth_hr2"] = _conv_entry(sd, f"{dl}.to_depth_hr.2")
    depth_layer["to_confidence_lr"] = _conv_entry(sd, f"{dl}.to_confidence_lr")
    depth_layer["to_confidence_hr0"] = _conv_entry(
        sd, f"{dl}.to_confidence_hr.0"
    )
    depth_layer["to_confidence_hr2"] = _conv_entry(
        sd, f"{dl}.to_confidence_hr.2"
    )
    p["depth_layer"] = depth_layer
    return {"params": p}


def convert_unidepth(state_dict: Mapping) -> dict:
    """Full UniDepthV2 checkpoint → {"vit", "decoder"} flax params."""
    return {
        "vit": convert_dinov2_vit(state_dict, "pixel_encoder"),
        "decoder": convert_unidepth_decoder(state_dict, "pixel_decoder"),
    }


def convert_geocalib(state_dict: Mapping) -> dict:
    """torch GeoCalib checkpoint → flax GeoCalibNet variables
    ({"params", "batch_stats"}; reference geocalib.py:105-133 +
    modules.py:23-620).  NMF2D is parameter-free; ConvModules in this model
    all run use_norm=False so only conv weights appear."""
    sd = {k.removeprefix("module."): _to_np(v) for k, v in state_dict.items()}
    params: dict = {}
    stats: dict = {}

    def bn(dst_p, dst_s, key):
        dst_p.update({"scale": np.asarray(sd[f"{key}.weight"], np.float32),
                      "bias": np.asarray(sd[f"{key}.bias"], np.float32)})
        dst_s.update({"mean": np.asarray(sd[f"{key}.running_mean"], np.float32),
                      "var": np.asarray(sd[f"{key}.running_var"], np.float32)})

    # ---------------- backbone (MSCAN, modules.py:560-620)
    bb_p: dict = {}
    bb_s: dict = {}
    bb = "backbone"
    bb_p["stem_conv1"] = _conv_entry(sd, f"{bb}.patch_embed1.proj.0")
    bb_p["stem_bn1"], bb_s["stem_bn1"] = {}, {}
    bn(bb_p["stem_bn1"], bb_s["stem_bn1"], f"{bb}.patch_embed1.proj.1")
    bb_p["stem_conv2"] = _conv_entry(sd, f"{bb}.patch_embed1.proj.3")
    bb_p["stem_bn2"], bb_s["stem_bn2"] = {}, {}
    bn(bb_p["stem_bn2"], bb_s["stem_bn2"], f"{bb}.patch_embed1.proj.4")
    depths = (3, 3, 12, 3)
    for i in range(4):
        if i > 0:
            bb_p[f"patch_embed{i + 1}"] = _conv_entry(
                sd, f"{bb}.patch_embed{i + 1}.proj"
            )
            bb_p[f"patch_bn{i + 1}"], bb_s[f"patch_bn{i + 1}"] = {}, {}
            bn(bb_p[f"patch_bn{i + 1}"], bb_s[f"patch_bn{i + 1}"],
               f"{bb}.patch_embed{i + 1}.norm")
        for j in range(depths[i]):
            b = f"{bb}.block{i + 1}.{j}"
            blk_p: dict = {
                "layer_scale_1": np.asarray(sd[f"{b}.layer_scale_1"], np.float32),
                "layer_scale_2": np.asarray(sd[f"{b}.layer_scale_2"], np.float32),
                "attn_proj1": _conv_entry(sd, f"{b}.attn.proj_1"),
                "attn_proj2": _conv_entry(sd, f"{b}.attn.proj_2"),
                "attn_gate": {
                    nm: _conv_entry(sd, f"{b}.attn.spatial_gating_unit.{nm}")
                    for nm in ("conv0", "conv0_1", "conv0_2", "conv1_1",
                               "conv1_2", "conv2_1", "conv2_2", "conv3")
                },
                "mlp": {
                    "fc1": _conv_entry(sd, f"{b}.mlp.fc1"),
                    "dwconv": {"dwconv": _conv_entry(sd, f"{b}.mlp.dwconv.dwconv")},
                    "fc2": _conv_entry(sd, f"{b}.mlp.fc2"),
                },
            }
            blk_s: dict = {"norm1": {}, "norm2": {}}
            blk_p["norm1"], blk_p["norm2"] = {}, {}
            bn(blk_p["norm1"], blk_s["norm1"], f"{b}.norm1")
            bn(blk_p["norm2"], blk_s["norm2"], f"{b}.norm2")
            bb_p[f"stage{i + 1}_block{j}"] = blk_p
            bb_s[f"stage{i + 1}_block{j}"] = blk_s
        bb_p[f"norm{i + 1}"] = _ln(sd, f"{bb}.norm{i + 1}")
    params["backbone"] = bb_p
    stats["backbone"] = bb_s

    # ---------------- low-level encoder
    params["ll_conv1"] = {"conv": _conv_entry(sd, "ll_enc.conv1.conv")}
    params["ll_conv2"] = {"conv": _conv_entry(sd, "ll_enc.conv2.conv")}

    # ---------------- decoders
    def ham_head(prefix):
        return {
            "squeeze": {"conv": _conv_entry(sd, f"{prefix}.squeeze.conv")},
            "hamburger": {
                "ham_in": {"conv": _conv_entry(sd, f"{prefix}.hamburger.ham_in.conv")},
                "ham_out": {"conv": _conv_entry(sd, f"{prefix}.hamburger.ham_out.conv")},
            },
            "align": {"conv": _conv_entry(sd, f"{prefix}.align.conv")},
            "out_conv": {"conv": _conv_entry(sd, f"{prefix}.out_conv.conv")},
            "ll_rcu1": {
                "conv1": _conv_entry(sd, f"{prefix}.ll_fusion.resConfUnit1.conv1"),
                "conv2": _conv_entry(sd, f"{prefix}.ll_fusion.resConfUnit1.conv2"),
            },
            "ll_rcu2": {
                "conv1": _conv_entry(sd, f"{prefix}.ll_fusion.resConfUnit2.conv1"),
                "conv2": _conv_entry(sd, f"{prefix}.ll_fusion.resConfUnit2.conv2"),
            },
            "unc_conv": {
                "conv": _conv_entry(sd, f"{prefix}.linear_pred_uncertainty.0.conv")
            },
            "unc_pred": _conv_entry(sd, f"{prefix}.linear_pred_uncertainty.1"),
        }

    pd = "perspective_decoder"
    params["up_decoder"] = ham_head(f"{pd}.up_head.decoder")
    params["linear_pred_up"] = _conv_entry(sd, f"{pd}.up_head.linear_pred_up")
    params["lat_decoder"] = ham_head(f"{pd}.latitude_head.decoder")
    params["linear_pred_latitude"] = _conv_entry(
        sd, f"{pd}.latitude_head.linear_pred_latitude"
    )
    return {"params": params, "batch_stats": stats}

