"""BERT text encoder for GroundingDINO, in flax, plus the special-token
mask machinery and an offline tokenizer fallback.

Reference: /root/reference/vipe/priors/track_anything/groundingdino/models/
main/bertwarper.py (HF bert-base-uncased wrapped to accept a custom
(B, L, L) self-attention mask + per-phrase position ids) and
util/get_tokenlizer.py.

Design: a compact flax BERT (post-LN, GELU) whose parameter tree mirrors the
HF naming for checkpoint conversion; the (B, L, L) phrase-isolation mask is
passed straight into the attention as an additive bias (TPU-friendly — no
HF extended-mask plumbing needed).  Tokenization is host-side: we use the HF
tokenizer when its vocab is available locally, else a deterministic
hash-vocabulary fallback with BERT-compatible special-token ids so the
pipeline stays runnable in this zero-egress environment.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# BERT special ids (bert-base-uncased vocab)
CLS_ID, SEP_ID, DOT_ID, QMARK_ID = 101, 102, 1012, 1029
SPECIAL_IDS = (CLS_ID, SEP_ID, DOT_ID, QMARK_ID)


@dataclasses.dataclass
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12


class BertSelfAttention(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x, attn_bias):
        c = self.cfg
        hd = c.hidden_size // c.num_heads
        q = nn.Dense(c.hidden_size, name="query")(x)
        k = nn.Dense(c.hidden_size, name="key")(x)
        v = nn.Dense(c.hidden_size, name="value")(x)
        B, L, _ = x.shape
        q = q.reshape(B, L, c.num_heads, hd)
        k = k.reshape(B, L, c.num_heads, hd)
        v = v.reshape(B, L, c.num_heads, hd)
        attn = jnp.einsum("blhd,bmhd->bhlm", q, k) / np.sqrt(hd)
        attn = attn + attn_bias[:, None]  # (B, 1, L, L)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhlm,bmhd->blhd", attn, v).reshape(B, L, -1)
        return out


class BertLayer(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x, attn_bias):
        c = self.cfg
        a = BertSelfAttention(c, name="attention_self")(x, attn_bias)
        a = nn.Dense(c.hidden_size, name="attention_output_dense")(a)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps,
                         name="attention_output_norm")(x + a)
        h = nn.Dense(c.intermediate_size, name="intermediate_dense")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.hidden_size, name="output_dense")(h)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="output_norm")(x + h)
        return x


class BertEncoder(nn.Module):
    """Embeddings + N post-LN layers; returns last hidden state."""

    cfg: BertConfig = dataclasses.field(default_factory=BertConfig)

    @nn.compact
    def __call__(self, input_ids, attention_mask_3d, position_ids):
        """input_ids: (B, L) int32; attention_mask_3d: (B, L, L) bool
        (True = attend, the reference's text_self_attention_masks);
        position_ids: (B, L) int32 per-phrase positions."""
        c = self.cfg
        we = self.param(
            "word_embeddings", nn.initializers.normal(0.02),
            (c.vocab_size, c.hidden_size),
        )
        pe = self.param(
            "position_embeddings", nn.initializers.normal(0.02),
            (c.max_position, c.hidden_size),
        )
        te = self.param(
            "token_type_embeddings", nn.initializers.normal(0.02),
            (c.type_vocab_size, c.hidden_size),
        )
        x = we[input_ids] + pe[position_ids] + te[jnp.zeros_like(input_ids)]
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="embeddings_norm")(x)

        bias = jnp.where(attention_mask_3d, 0.0, -1e9).astype(x.dtype)
        for i in range(c.num_layers):
            x = BertLayer(c, name=f"layer_{i}")(x, bias)
        return x


# ------------------------------------------------------------- host helpers


def generate_special_token_masks(
    input_ids: np.ndarray, special_ids: Sequence[int] = SPECIAL_IDS
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-phrase self-attention mask + position ids (reference
    bertwarper.py:237-293): tokens between consecutive special tokens attend
    only within their segment (and the special token closing it); positions
    restart at 0 per segment."""
    bs, L = input_ids.shape
    special = np.isin(input_ids, np.asarray(special_ids))
    attention_mask = np.tile(np.eye(L, dtype=bool), (bs, 1, 1))
    position_ids = np.zeros((bs, L), np.int64)
    for row in range(bs):
        previous_col = 0
        for col in np.nonzero(special[row])[0]:
            if col in (0, L - 1):
                attention_mask[row, col, col] = True
                position_ids[row, col] = 0
            else:
                attention_mask[
                    row, previous_col + 1: col + 1, previous_col + 1: col + 1
                ] = True
                position_ids[row, previous_col + 1: col + 1] = np.arange(
                    0, col - previous_col
                )
            previous_col = col
    return attention_mask, position_ids


class HashTokenizer:
    """Deterministic offline tokenizer with BERT-compatible special ids.

    Maps each lowercase word to a stable id in [2000, 30000); '.' and '?'
    get their real BERT ids so phrase segmentation (and therefore the
    per-phrase attention masks + logit→phrase decoding) behaves exactly like
    the reference.  Replaced by the HF tokenizer when a local vocab exists —
    the id VALUES only matter once converted real weights are loaded, at
    which point the HF path is required anyway.
    """

    def __init__(self):
        self._cache = {}

    def _word_id(self, w: str) -> int:
        if w not in self._cache:
            h = 2166136261
            for ch in w.encode():  # FNV-1a, 32-bit
                h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
            self._cache[w] = 2000 + h % 28000
        return self._cache[w]

    def __call__(self, caption: str) -> List[int]:
        """caption 'a . b c .' → [CLS, a, ., b, c, ., SEP]"""
        ids = [CLS_ID]
        for raw in caption.lower().split():
            if raw == ".":
                ids.append(DOT_ID)
                continue
            core = raw.rstrip(".?")
            if core:
                ids.append(self._word_id(core))
            for ch in raw[len(core):]:
                ids.append(DOT_ID if ch == "." else QMARK_ID)
        ids.append(SEP_ID)
        return ids


def make_tokenizer():
    """HF bert-base-uncased tokenizer if locally cached, else HashTokenizer."""
    try:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(
            "bert-base-uncased", local_files_only=True
        )

        class _HF:
            def __call__(self, caption: str) -> List[int]:
                return tok(caption)["input_ids"]

        return _HF()
    except Exception:
        return HashTokenizer()
