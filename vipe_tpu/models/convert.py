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
