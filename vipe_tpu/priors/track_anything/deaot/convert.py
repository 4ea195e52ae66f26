"""torch→flax weight conversion for DeAOT (R50_DeAOTL_PRE_YTB_DAV).

Key layout follows the reference module tree (aot/networks/models/deaot.py:
encoder.*, encoder_projector, LSTT.layers.{i}.*, LSTT.decoder_norms.0,
patch_wise_id_bank, id_norm, decoder.*).  ``synthetic_state_dict`` creates a
random reference-shaped state dict for the zero-egress converter test.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def _lin(sd, key):
    return {"kernel": np.ascontiguousarray(sd[f"{key}.weight"].T),
            "bias": np.asarray(sd[f"{key}.bias"])}


def _ln(sd, key):
    return {"scale": np.asarray(sd[f"{key}.weight"]),
            "bias": np.asarray(sd[f"{key}.bias"])}


def _gn(sd, key):
    return _ln(sd, key)


def _conv(sd, key, bias=True):
    out = {"kernel": np.asarray(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)}
    if bias:
        out["bias"] = np.asarray(sd[f"{key}.bias"])
    return out


def _dwconv(sd, key):
    """torch depthwise conv (C,1,k,k) → flax feature_group_count kernel
    (k,k,1,C)."""
    return {"kernel": np.asarray(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)}


def _frozen_bn(sd, key):
    return {
        "scale": np.asarray(sd[f"{key}.weight"]),
        "bias": np.asarray(sd[f"{key}.bias"]),
        "mean": np.asarray(sd[f"{key}.running_mean"]),
        "var": np.asarray(sd[f"{key}.running_var"]),
    }


def _gated_prop(sd, key, use_linear: bool):
    out = {
        "dw_conv": {"conv": _dwconv(sd, f"{key}.dw_conv.conv")},
        "projection": _lin(sd, f"{key}.projection"),
    }
    if use_linear:
        for k in ("linear_QK", "linear_V1", "linear_V2", "linear_U1",
                  "linear_U2"):
            out[k] = _lin(sd, f"{key}.{k}")
    return out


def _local_gated_prop(sd, key):
    return {
        "relative_emb_k": _conv(sd, f"{key}.relative_emb_k"),
        "dw_conv": {"conv": _dwconv(sd, f"{key}.dw_conv.conv")},
        "projection": _lin(sd, f"{key}.projection"),
    }


def convert_deaot(sd: Mapping, cfg) -> dict:
    p: dict = {}

    # --------------------------------------------------------- encoder
    enc: dict = {
        "conv1": _conv(sd, "encoder.conv1", bias=False),
        "bn1": _frozen_bn(sd, "encoder.bn1"),
    }
    for s, blocks in enumerate(cfg.resnet_blocks):
        for b in range(blocks):
            k = f"encoder.layer{s + 1}.{b}"
            blk = {
                "conv1": _conv(sd, f"{k}.conv1", bias=False),
                "bn1": _frozen_bn(sd, f"{k}.bn1"),
                "conv2": _conv(sd, f"{k}.conv2", bias=False),
                "bn2": _frozen_bn(sd, f"{k}.bn2"),
                "conv3": _conv(sd, f"{k}.conv3", bias=False),
                "bn3": _frozen_bn(sd, f"{k}.bn3"),
            }
            if b == 0:
                blk["downsample_conv"] = _conv(
                    sd, f"{k}.downsample.0", bias=False)
                blk["downsample_bn"] = _frozen_bn(sd, f"{k}.downsample.1")
            enc[f"layer{s + 1}_{b}"] = blk
    p["encoder"] = enc
    p["encoder_projector"] = _conv(sd, "encoder_projector")

    # ------------------------------------------------------------- LSTT
    for i in range(cfg.lstt_num):
        k = f"LSTT.layers.{i}"
        layer = {
            "norm1": _ln(sd, f"{k}.norm1"),
            "linear_QV": _lin(sd, f"{k}.linear_QV"),
            "linear_U": _lin(sd, f"{k}.linear_U"),
            "linear_ID_V": _lin(sd, f"{k}.linear_ID_V"),
            "long_term_attn": _gated_prop(sd, f"{k}.long_term_attn", False),
            "short_term_attn": _local_gated_prop(sd, f"{k}.short_term_attn"),
            "norm2": _ln(sd, f"{k}.norm2"),
            "id_norm2": _ln(sd, f"{k}.id_norm2"),
            "self_attn": _gated_prop(sd, f"{k}.self_attn", True),
        }
        if i > 0:
            layer["id_norm1"] = _ln(sd, f"{k}.id_norm1")
            layer["linear_ID_U"] = _lin(sd, f"{k}.linear_ID_U")
        p[f"lstt_{i}"] = layer
    p["decoder_norm"] = _gn(sd, "LSTT.decoder_norms.0.gn")

    # --------------------------------------------------------- id bank
    p["patch_wise_id_bank"] = _conv(sd, "patch_wise_id_bank")
    p["id_norm"] = _ln(sd, "id_norm")

    # ---------------------------------------------------------- decoder
    p["dec_conv_in"] = _conv(sd, "decoder.conv_in.conv")
    p["dec_gn_in"] = _gn(sd, "decoder.conv_in.gn")
    p["dec_conv_16x"] = _conv(sd, "decoder.conv_16x.conv")
    p["dec_gn_16x"] = _gn(sd, "decoder.conv_16x.gn")
    p["dec_conv_8x"] = _conv(sd, "decoder.conv_8x.conv")
    p["dec_gn_8x"] = _gn(sd, "decoder.conv_8x.gn")
    p["dec_conv_4x"] = _conv(sd, "decoder.conv_4x.conv")
    p["dec_gn_4x"] = _gn(sd, "decoder.conv_4x.gn")
    p["dec_adapter_16x"] = _conv(sd, "decoder.adapter_16x")
    p["dec_adapter_8x"] = _conv(sd, "decoder.adapter_8x")
    p["dec_adapter_4x"] = _conv(sd, "decoder.adapter_4x")
    p["dec_conv_out"] = _conv(sd, "decoder.conv_out")
    return {"params": p}


def synthetic_state_dict(cfg, seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    sd: dict = {}

    def lin(key, i, o):
        sd[f"{key}.weight"] = rng.standard_normal((o, i)).astype(np.float32)
        sd[f"{key}.bias"] = rng.standard_normal((o,)).astype(np.float32)

    def ln(key, n):
        sd[f"{key}.weight"] = np.ones((n,), np.float32)
        sd[f"{key}.bias"] = np.zeros((n,), np.float32)

    def conv(key, i, o, ksz, bias=True, groups=1):
        sd[f"{key}.weight"] = rng.standard_normal(
            (o, i // groups, ksz, ksz)).astype(np.float32)
        if bias:
            sd[f"{key}.bias"] = rng.standard_normal((o,)).astype(np.float32)

    def bn(key, n):
        sd[f"{key}.weight"] = np.ones((n,), np.float32)
        sd[f"{key}.bias"] = np.zeros((n,), np.float32)
        sd[f"{key}.running_mean"] = np.zeros((n,), np.float32)
        sd[f"{key}.running_var"] = np.ones((n,), np.float32)

    d = cfg.d_model
    ed = int(d * cfg.expand_ratio)   # expand_d_model
    edvu = int(2 * d * cfg.expand_ratio)

    stem = cfg.encoder_dims[0] // 4
    conv("encoder.conv1", 3, stem, 7, bias=False)
    bn("encoder.bn1", stem)
    inplanes = stem
    for s, blocks in enumerate(cfg.resnet_blocks):
        planes = cfg.encoder_dims[s] // 4
        for b in range(blocks):
            k = f"encoder.layer{s + 1}.{b}"
            conv(f"{k}.conv1", inplanes if b == 0 else 4 * planes, planes, 1,
                 bias=False)
            bn(f"{k}.bn1", planes)
            conv(f"{k}.conv2", planes, planes, 3, bias=False)
            bn(f"{k}.bn2", planes)
            conv(f"{k}.conv3", planes, 4 * planes, 1, bias=False)
            bn(f"{k}.bn3", 4 * planes)
            if b == 0:
                conv(f"{k}.downsample.0", inplanes, 4 * planes, 1, bias=False)
                bn(f"{k}.downsample.1", 4 * planes)
        inplanes = 4 * planes
    conv("encoder_projector", cfg.encoder_dims[-1], d, 1)

    for i in range(cfg.lstt_num):
        k = f"LSTT.layers.{i}"
        ln(f"{k}.norm1", d)
        lin(f"{k}.linear_QV", d, cfg.d_att * cfg.att_heads + ed)
        lin(f"{k}.linear_U", d, ed)
        lin(f"{k}.linear_ID_V", d if i == 0 else 2 * d, ed)
        if i > 0:
            ln(f"{k}.id_norm1", d)
            lin(f"{k}.linear_ID_U", d, ed)
        conv(f"{k}.long_term_attn.dw_conv.conv", edvu, edvu, 5, bias=False,
             groups=edvu)
        lin(f"{k}.long_term_attn.projection", edvu, 2 * d)
        win = 2 * cfg.max_dis + 1
        conv(f"{k}.short_term_attn.relative_emb_k",
             cfg.d_att * cfg.att_heads, cfg.att_heads * win * win, 1,
             groups=cfg.att_heads)
        conv(f"{k}.short_term_attn.dw_conv.conv", edvu, edvu, 5, bias=False,
             groups=edvu)
        lin(f"{k}.short_term_attn.projection", edvu, 2 * d)
        ln(f"{k}.norm2", d)
        ln(f"{k}.id_norm2", d)
        sa = f"{k}.self_attn"
        lin(f"{sa}.linear_QK", 2 * d, cfg.d_att * cfg.self_heads)
        half = edvu // 2
        lin(f"{sa}.linear_V1", d, half)
        lin(f"{sa}.linear_V2", d, half)
        lin(f"{sa}.linear_U1", d, half)
        lin(f"{sa}.linear_U2", d, half)
        conv(f"{sa}.dw_conv.conv", edvu, edvu, 5, bias=False, groups=edvu)
        lin(f"{sa}.projection", edvu, 2 * d)
    ln("LSTT.decoder_norms.0.gn", 2 * d)

    conv("patch_wise_id_bank", cfg.max_obj_num + 1, d, 17)
    ln("id_norm", d)

    hd = d
    conv("decoder.conv_in.conv", 2 * d, hd, 1)
    ln("decoder.conv_in.gn", hd)
    conv("decoder.conv_16x.conv", hd, hd, 3)
    ln("decoder.conv_16x.gn", hd)
    conv("decoder.conv_8x.conv", hd, hd // 2, 3)
    ln("decoder.conv_8x.gn", hd // 2)
    conv("decoder.conv_4x.conv", hd // 2, hd // 2, 3)
    ln("decoder.conv_4x.gn", hd // 2)
    conv("decoder.adapter_16x", cfg.encoder_dims[-2], hd, 1)
    conv("decoder.adapter_8x", cfg.encoder_dims[-3], hd, 1)
    conv("decoder.adapter_4x", cfg.encoder_dims[-4], hd // 2, 1)
    conv("decoder.conv_out", hd // 2, cfg.max_obj_num + 1, 1)
    return sd
