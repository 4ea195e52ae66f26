"""torch→flax weight conversion for GroundingDINO (swint_ogc checkpoint).

Key layout follows the reference module tree
(/root/reference/vipe/priors/track_anything/groundingdino/models/main/
groundingdino.py + transformer.py + backbone/swin_transformer.py +
HF bert-base-uncased).  ``synthetic_state_dict`` builds a random state dict
with exactly those keys/shapes so the mapping is testable without weights
(zero-egress environment); once the real ``groundingdino_swint_ogc.pth``
is available, ``convert_gdino(torch.load(...)['model'])`` drops in.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def _lin(sd, key):
    return {"kernel": np.ascontiguousarray(sd[f"{key}.weight"].T),
            "bias": np.asarray(sd[f"{key}.bias"])}


def _lin_nobias(sd, key):
    return {"kernel": np.ascontiguousarray(sd[f"{key}.weight"].T)}


def _ln(sd, key):
    return {"scale": np.asarray(sd[f"{key}.weight"]),
            "bias": np.asarray(sd[f"{key}.bias"])}


def _conv(sd, key):
    return {"kernel": np.asarray(sd[f"{key}.weight"]).transpose(2, 3, 1, 0),
            "bias": np.asarray(sd[f"{key}.bias"])}


def _mha(sd, key, dim):
    """torch nn.MultiheadAttention (packed in_proj) → q/k/v/out Dense."""
    w = np.asarray(sd[f"{key}.in_proj_weight"])
    b = np.asarray(sd[f"{key}.in_proj_bias"])
    return {
        "q_proj": {"kernel": w[:dim].T.copy(), "bias": b[:dim].copy()},
        "k_proj": {"kernel": w[dim: 2 * dim].T.copy(),
                   "bias": b[dim: 2 * dim].copy()},
        "v_proj": {"kernel": w[2 * dim:].T.copy(), "bias": b[2 * dim:].copy()},
        "out_proj": _lin(sd, f"{key}.out_proj"),
    }


def _mlp(sd, key, n):
    return {f"layers_{j}": _lin(sd, f"{key}.layers.{j}") for j in range(n)}


def _msdeform(sd, key):
    return {k: _lin(sd, f"{key}.{k}") for k in
            ("sampling_offsets", "attention_weights", "value_proj",
             "output_proj")}


def _bi_attn(sd, key):
    out = {k: _lin(sd, f"{key}.{k}") for k in
           ("v_proj", "l_proj", "values_v_proj", "values_l_proj",
            "out_v_proj", "out_l_proj")}
    return out


def convert_gdino(sd: Mapping, cfg) -> dict:
    """Reference state dict (numpy values) → flax params for
    GroundingDINOModel(cfg)."""
    p: dict = {}

    # ------------------------------------------------------- swin backbone
    bb: dict = {
        "patch_embed_proj": _conv(sd, "backbone.0.patch_embed.proj"),
        "patch_embed_norm": _ln(sd, "backbone.0.patch_embed.norm"),
    }
    for i, depth in enumerate(cfg.swin_depths):
        for b in range(depth):
            k = f"backbone.0.layers.{i}.blocks.{b}"
            bb[f"layers_{i}_blocks_{b}"] = {
                "norm1": _ln(sd, f"{k}.norm1"),
                "norm2": _ln(sd, f"{k}.norm2"),
                "attn": {
                    "qkv": _lin(sd, f"{k}.attn.qkv"),
                    "proj": _lin(sd, f"{k}.attn.proj"),
                    "relative_position_bias_table": np.asarray(
                        sd[f"{k}.attn.relative_position_bias_table"]
                    ),
                },
                "mlp": {"fc1": _lin(sd, f"{k}.mlp.fc1"),
                        "fc2": _lin(sd, f"{k}.mlp.fc2")},
            }
        if i < len(cfg.swin_depths) - 1:
            k = f"backbone.0.layers.{i}.downsample"
            bb[f"layers_{i}_downsample"] = {
                "norm": _ln(sd, f"{k}.norm"),
                "reduction": _lin_nobias(sd, f"{k}.reduction"),
            }
    for i in (1, 2, 3):
        bb[f"out_norm{i}"] = _ln(sd, f"backbone.0.norm{i}")
    p["backbone"] = bb

    # --------------------------------------------------------------- bert
    c = cfg.bert
    bert: dict = {
        "word_embeddings": np.asarray(
            sd["bert.embeddings.word_embeddings.weight"]),
        "position_embeddings": np.asarray(
            sd["bert.embeddings.position_embeddings.weight"]),
        "token_type_embeddings": np.asarray(
            sd["bert.embeddings.token_type_embeddings.weight"]),
        "embeddings_norm": _ln(sd, "bert.embeddings.LayerNorm"),
    }
    for i in range(c.num_layers):
        k = f"bert.encoder.layer.{i}"
        bert[f"layer_{i}"] = {
            "attention_self": {
                "query": _lin(sd, f"{k}.attention.self.query"),
                "key": _lin(sd, f"{k}.attention.self.key"),
                "value": _lin(sd, f"{k}.attention.self.value"),
            },
            "attention_output_dense": _lin(sd, f"{k}.attention.output.dense"),
            "attention_output_norm": _ln(sd, f"{k}.attention.output.LayerNorm"),
            "intermediate_dense": _lin(sd, f"{k}.intermediate.dense"),
            "output_dense": _lin(sd, f"{k}.output.dense"),
            "output_norm": _ln(sd, f"{k}.output.LayerNorm"),
        }
    p["bert"] = bert
    p["feat_map"] = _lin(sd, "feat_map")

    # ------------------------------------------------------- input proj
    for i in range(cfg.num_levels):
        p[f"input_proj_{i}"] = _conv(sd, f"input_proj.{i}.0")
        p[f"input_proj_norm_{i}"] = _ln(sd, f"input_proj.{i}.1")
    p["level_embed"] = np.asarray(sd["transformer.level_embed"])

    # ----------------------------------------------------------- encoder
    d = cfg.hidden_dim
    for i in range(cfg.enc_layers):
        k = f"transformer.encoder.fusion_layers.{i}"
        p[f"fusion_{i}"] = {
            "layer_norm_v": _ln(sd, f"{k}.layer_norm_v"),
            "layer_norm_l": _ln(sd, f"{k}.layer_norm_l"),
            "attn": _bi_attn(sd, f"{k}.attn"),
            "gamma_v": np.asarray(sd[f"{k}.gamma_v"]),
            "gamma_l": np.asarray(sd[f"{k}.gamma_l"]),
        }
        k = f"transformer.encoder.text_layers.{i}"
        p[f"text_layer_{i}"] = {
            "self_attn": _mha(sd, f"{k}.self_attn", d),
            "linear1": _lin(sd, f"{k}.linear1"),
            "linear2": _lin(sd, f"{k}.linear2"),
            "norm1": _ln(sd, f"{k}.norm1"),
            "norm2": _ln(sd, f"{k}.norm2"),
        }
        k = f"transformer.encoder.layers.{i}"
        p[f"enc_layer_{i}"] = {
            "self_attn": _msdeform(sd, f"{k}.self_attn"),
            "norm1": _ln(sd, f"{k}.norm1"),
            "linear1": _lin(sd, f"{k}.linear1"),
            "linear2": _lin(sd, f"{k}.linear2"),
            "norm2": _ln(sd, f"{k}.norm2"),
        }

    # --------------------------------------------------------- two-stage
    p["enc_output"] = _lin(sd, "transformer.enc_output")
    p["enc_output_norm"] = _ln(sd, "transformer.enc_output_norm")
    p["enc_out_bbox_embed"] = _mlp(sd, "transformer.enc_out_bbox_embed", 3)
    p["tgt_embed"] = np.asarray(sd["transformer.tgt_embed.weight"])

    # ----------------------------------------------------------- decoder
    for i in range(cfg.dec_layers):
        k = f"transformer.decoder.layers.{i}"
        p[f"dec_layer_{i}"] = {
            "self_attn": _mha(sd, f"{k}.self_attn", d),
            "norm2": _ln(sd, f"{k}.norm2"),
            "ca_text": _mha(sd, f"{k}.ca_text", d),
            "catext_norm": _ln(sd, f"{k}.catext_norm"),
            "cross_attn": _msdeform(sd, f"{k}.cross_attn"),
            "norm1": _ln(sd, f"{k}.norm1"),
            "linear1": _lin(sd, f"{k}.linear1"),
            "linear2": _lin(sd, f"{k}.linear2"),
            "norm3": _ln(sd, f"{k}.norm3"),
        }
    p["ref_point_head"] = _mlp(sd, "transformer.decoder.ref_point_head", 2)
    p["dec_norm"] = _ln(sd, "transformer.decoder.norm")
    # bbox_embed is shared across decoder layers (dec_pred_bbox_embed_share)
    p["bbox_embed"] = _mlp(sd, "bbox_embed.0", 3)
    return {"params": p}


def synthetic_state_dict(cfg, seed: int = 0) -> dict:
    """Random state dict with the REFERENCE's key names/shapes (see module
    docstring) — lets tests validate the converter without weights."""
    rng = np.random.default_rng(seed)
    sd: dict = {}

    def lin(key, i, o, bias=True):
        sd[f"{key}.weight"] = rng.standard_normal((o, i)).astype(np.float32)
        if bias:
            sd[f"{key}.bias"] = rng.standard_normal((o,)).astype(np.float32)

    def ln(key, n):
        sd[f"{key}.weight"] = np.ones((n,), np.float32)
        sd[f"{key}.bias"] = np.zeros((n,), np.float32)

    def conv(key, i, o, ksz):
        sd[f"{key}.weight"] = rng.standard_normal(
            (o, i, ksz, ksz)).astype(np.float32)
        sd[f"{key}.bias"] = rng.standard_normal((o,)).astype(np.float32)

    def mha(key, dim):
        sd[f"{key}.in_proj_weight"] = rng.standard_normal(
            (3 * dim, dim)).astype(np.float32)
        sd[f"{key}.in_proj_bias"] = rng.standard_normal(
            (3 * dim,)).astype(np.float32)
        lin(f"{key}.out_proj", dim, dim)

    def msdeform(key, dim, heads, levels, points):
        lin(f"{key}.sampling_offsets", dim, heads * levels * points * 2)
        lin(f"{key}.attention_weights", dim, heads * levels * points)
        lin(f"{key}.value_proj", dim, dim)
        lin(f"{key}.output_proj", dim, dim)

    def mlp(key, dims):
        for j, (i, o) in enumerate(zip(dims[:-1], dims[1:])):
            lin(f"{key}.layers.{j}", i, o)

    # swin
    e = cfg.swin_embed_dim
    conv("backbone.0.patch_embed.proj", 3, e, 4)
    ln("backbone.0.patch_embed.norm", e)
    for i, depth in enumerate(cfg.swin_depths):
        dim = e * 2 ** i
        for b in range(depth):
            k = f"backbone.0.layers.{i}.blocks.{b}"
            ln(f"{k}.norm1", dim)
            ln(f"{k}.norm2", dim)
            lin(f"{k}.attn.qkv", dim, 3 * dim)
            lin(f"{k}.attn.proj", dim, dim)
            sd[f"{k}.attn.relative_position_bias_table"] = rng.standard_normal(
                ((2 * cfg.swin_window - 1) ** 2, cfg.swin_heads[i])
            ).astype(np.float32)
            lin(f"{k}.mlp.fc1", dim, 4 * dim)
            lin(f"{k}.mlp.fc2", 4 * dim, dim)
        if i < len(cfg.swin_depths) - 1:
            k = f"backbone.0.layers.{i}.downsample"
            ln(f"{k}.norm", 4 * dim)
            lin(f"{k}.reduction", 4 * dim, 2 * dim, bias=False)
    for i in (1, 2, 3):
        ln(f"backbone.0.norm{i}", e * 2 ** i)

    # bert
    c = cfg.bert
    sd["bert.embeddings.word_embeddings.weight"] = rng.standard_normal(
        (c.vocab_size, c.hidden_size)).astype(np.float32)
    sd["bert.embeddings.position_embeddings.weight"] = rng.standard_normal(
        (c.max_position, c.hidden_size)).astype(np.float32)
    sd["bert.embeddings.token_type_embeddings.weight"] = rng.standard_normal(
        (c.type_vocab_size, c.hidden_size)).astype(np.float32)
    ln("bert.embeddings.LayerNorm", c.hidden_size)
    for i in range(c.num_layers):
        k = f"bert.encoder.layer.{i}"
        for q in ("query", "key", "value"):
            lin(f"{k}.attention.self.{q}", c.hidden_size, c.hidden_size)
        lin(f"{k}.attention.output.dense", c.hidden_size, c.hidden_size)
        ln(f"{k}.attention.output.LayerNorm", c.hidden_size)
        lin(f"{k}.intermediate.dense", c.hidden_size, c.intermediate_size)
        lin(f"{k}.output.dense", c.intermediate_size, c.hidden_size)
        ln(f"{k}.output.LayerNorm", c.hidden_size)
    lin("feat_map", c.hidden_size, cfg.hidden_dim)

    # input projections: 1x1 on the three swin outputs + 3x3/s2 extra
    d = cfg.hidden_dim
    chans = [e * 2, e * 4, e * 8]
    for i in range(cfg.num_levels):
        if i < 3:
            conv(f"input_proj.{i}.0", chans[i], d, 1)
        else:
            conv(f"input_proj.{i}.0", chans[-1], d, 3)
        ln(f"input_proj.{i}.1", d)
    sd["transformer.level_embed"] = rng.standard_normal(
        (cfg.num_levels, d)).astype(np.float32)

    for i in range(cfg.enc_layers):
        k = f"transformer.encoder.fusion_layers.{i}"
        ln(f"{k}.layer_norm_v", d)
        ln(f"{k}.layer_norm_l", d)
        emb = cfg.ffn_dim // 2
        lin(f"{k}.attn.v_proj", d, emb)
        lin(f"{k}.attn.l_proj", d, emb)
        lin(f"{k}.attn.values_v_proj", d, emb)
        lin(f"{k}.attn.values_l_proj", d, emb)
        lin(f"{k}.attn.out_v_proj", emb, d)
        lin(f"{k}.attn.out_l_proj", emb, d)
        sd[f"{k}.gamma_v"] = np.full((d,), 1e-4, np.float32)
        sd[f"{k}.gamma_l"] = np.full((d,), 1e-4, np.float32)
        k = f"transformer.encoder.text_layers.{i}"
        mha(f"{k}.self_attn", d)
        lin(f"{k}.linear1", d, cfg.ffn_dim // 2)
        lin(f"{k}.linear2", cfg.ffn_dim // 2, d)
        ln(f"{k}.norm1", d)
        ln(f"{k}.norm2", d)
        k = f"transformer.encoder.layers.{i}"
        msdeform(f"{k}.self_attn", d, cfg.nheads, cfg.num_levels,
                 cfg.enc_points)
        ln(f"{k}.norm1", d)
        lin(f"{k}.linear1", d, cfg.ffn_dim)
        lin(f"{k}.linear2", cfg.ffn_dim, d)
        ln(f"{k}.norm2", d)

    lin("transformer.enc_output", d, d)
    ln("transformer.enc_output_norm", d)
    mlp("transformer.enc_out_bbox_embed", [d, d, d, 4])
    sd["transformer.tgt_embed.weight"] = rng.standard_normal(
        (cfg.num_queries, d)).astype(np.float32)

    for i in range(cfg.dec_layers):
        k = f"transformer.decoder.layers.{i}"
        mha(f"{k}.self_attn", d)
        ln(f"{k}.norm2", d)
        mha(f"{k}.ca_text", d)
        ln(f"{k}.catext_norm", d)
        msdeform(f"{k}.cross_attn", d, cfg.nheads, cfg.num_levels,
                 cfg.dec_points)
        ln(f"{k}.norm1", d)
        lin(f"{k}.linear1", d, cfg.ffn_dim)
        lin(f"{k}.linear2", cfg.ffn_dim, d)
        ln(f"{k}.norm3", d)
    mlp("transformer.decoder.ref_point_head", [2 * d, d, d])
    ln("transformer.decoder.norm", d)
    mlp("bbox_embed.0", [d, d, d, 4])
    return sd
