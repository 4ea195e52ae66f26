"""DeAOT (R50_DeAOTL) network in flax — decoupled gated propagation VOS.

Reference: /root/reference/vipe/priors/track_anything/aot/ —
networks/models/{aot,deaot}.py, layers/transformer.py (DualBranchGPM +
GatedPropagationModule), layers/attention.py (GatedPropagation,
LocalGatedPropagation w/ SpatialCorrelationSampler), encoders/resnet.py
(ResNet50, output-stride 16, stage 5 dropped), decoders/fpn.py.

TPU-native notes:
* Local (short-term) attention: the reference computes 15×15 windowed dots
  with a CUDA correlation sampler, then scatters them into a DENSE hw×hw
  attention matrix and matmuls (attention.py:857-900 local2global).  Here the
  windowed dots come from `lax.conv_general_dilated_patches` (unfold) and the
  value aggregation reuses the reference's own dense-matmul trick — a static
  scatter into (hw, padded-hw) followed by one MXU matmul.
* Long-term memory is a token-concatenated KV cache; the engine pads it to
  power-of-two frame buckets with a validity mask so each propagate step is
  one of a few compiled programs.
* align_corners=True bilinear resizes (MODEL_ALIGN_CORNERS) are explicit
  gather+lerp with trace-time index math.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DeAOTConfig:
    """R50_DeAOTL (reference aot/config.py MyModelConfig)."""

    d_model: int = 256
    lstt_num: int = 3
    self_heads: int = 1
    att_heads: int = 1
    ffn_dim: int = 1024
    max_obj_num: int = 10
    max_dis: int = 7          # local window = 15
    expand_ratio: float = 2.0
    encoder_dims: Tuple[int, ...] = (256, 512, 1024, 1024)
    resnet_blocks: Tuple[int, ...] = (3, 4, 6)

    @property
    def d_att(self) -> int:
        # attention.py: d_att = d_model // 2 when att_heads == 1
        return self.d_model // 2 if self.att_heads == 1 else self.d_model // self.att_heads

    @staticmethod
    def tiny() -> "DeAOTConfig":
        return DeAOTConfig(
            d_model=32, lstt_num=2, ffn_dim=64, max_obj_num=10, max_dis=2,
            encoder_dims=(16, 24, 32, 32), resnet_blocks=(1, 1, 1),
        )


def silu(x):
    return x * jax.nn.sigmoid(x)


from ....ops.resize import resize_align_corners  # noqa: F401 — re-export


# ---------------------------------------------------------------- encoder


class FrozenBN(nn.Module):
    """FrozenBatchNorm2d: affine transform with stored running stats."""

    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        return (x - mean) * scale * jax.lax.rsqrt(var + 1e-5) + bias


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        r = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(FrozenBN(self.planes, name="bn1")(y))
        y = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            kernel_dilation=(self.dilation, self.dilation),
            padding=((self.dilation, self.dilation),) * 2,
            use_bias=False, name="conv2",
        )(y)
        y = nn.relu(FrozenBN(self.planes, name="bn2")(y))
        y = nn.Conv(4 * self.planes, (1, 1), use_bias=False, name="conv3")(y)
        y = FrozenBN(4 * self.planes, name="bn3")(y)
        if self.downsample:
            r = nn.Conv(
                4 * self.planes, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="downsample_conv",
            )(x)
            r = FrozenBN(4 * self.planes, name="downsample_bn")(r)
        return nn.relu(y + r)


class ResNetEncoder(nn.Module):
    """ResNet-50 output-stride 16, stages 1-3, stage-3 output duplicated
    (reference resnet.py:59-160: layer4 dropped, xs = [4x, 8x, 16x, 16x])."""

    cfg: DeAOTConfig

    @nn.compact
    def __call__(self, x):
        stem = self.cfg.encoder_dims[0] // 4  # 64 for resnet50
        x = nn.Conv(stem, (7, 7), strides=(2, 2),
                    padding=((3, 3), (3, 3)), use_bias=False, name="conv1")(x)
        x = nn.relu(FrozenBN(x.shape[-1], name="bn1")(x))
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-1e9)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        xs = []
        strides = (1, 2, 2)
        for s, (blocks, planes4) in enumerate(
            zip(self.cfg.resnet_blocks, self.cfg.encoder_dims[:3])
        ):
            planes = planes4 // 4
            for b in range(blocks):
                x = Bottleneck(
                    planes,
                    stride=strides[s] if b == 0 else 1,
                    downsample=(b == 0),
                    name=f"layer{s + 1}_{b}",
                )(x)
            xs.append(x)
        xs.append(x)  # 16x duplicated (stage 5 dropped)
        return xs


# ------------------------------------------------------------- attention


class DWConv2d(nn.Module):
    """Depthwise 5×5 over (hw, B, C) sequences (basic.py:37-50)."""

    @nn.compact
    def __call__(self, x, size_2d):
        h, w = size_2d
        L, B, C = x.shape
        y = x.reshape(h, w, B, C).transpose(2, 0, 1, 3)
        y = nn.Conv(C, (5, 5), padding=((2, 2), (2, 2)), feature_group_count=C,
                    use_bias=False, name="conv")(y)
        return y.transpose(1, 2, 0, 3).reshape(L, B, C)


class GatedPropagation(nn.Module):
    """Global gated attention (attention.py:594-721).  Sequence layout
    (tokens, B, C) like the reference."""

    d_qk: int
    d_vu: int
    num_head: int
    d_att: int
    use_linear: bool = False
    expand_ratio: float = 2.0

    @nn.compact
    def __call__(self, Q, K, V, U, size_2d, k_mask=None):
        expand_d_vu = int(self.d_vu * self.expand_ratio)
        hidden = expand_d_vu // self.num_head
        L, B, _ = Q.shape

        if self.use_linear:
            Q = K = nn.Dense(self.d_att * self.num_head, name="linear_QK")(Q)

            def cat_halves(x1, x2):
                if self.num_head > 1:
                    x1 = x1.reshape(-1, B, self.num_head, hidden // 2)
                    x2 = x2.reshape(-1, B, self.num_head, hidden // 2)
                    return jnp.concatenate([x1, x2], -1).reshape(-1, B, expand_d_vu)
                return jnp.concatenate([x1, x2], -1)

            half = hidden * self.num_head // 2
            V1, V2 = jnp.split(V, 2, axis=-1)
            V = silu(cat_halves(nn.Dense(half, name="linear_V1")(V1),
                                nn.Dense(half, name="linear_V2")(V2)))
            U1, U2 = jnp.split(U, 2, axis=-1)
            U = silu(cat_halves(nn.Dense(half, name="linear_U1")(U1),
                                nn.Dense(half, name="linear_U2")(U2)))

        T = self.d_att ** 0.5
        q = (Q / T).reshape(-1, B, self.num_head, self.d_att)
        k = K.reshape(-1, B, self.num_head, self.d_att)
        v = V.reshape(-1, B, self.num_head, hidden)
        attn = jnp.einsum("qbhd,kbhd->bhqk", q, k)
        if k_mask is not None:
            attn = attn + jnp.where(k_mask, 0.0, -1e9)[:, None, None, :]
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,kbhd->qbhd", attn, v).reshape(L, B, -1)
        out = out * U
        out = DWConv2d(name="dw_conv")(out, size_2d)
        return nn.Dense(self.d_vu, name="projection")(out)


@functools.lru_cache(maxsize=None)
def _local_scatter_indices(h: int, w: int, max_dis: int) -> np.ndarray:
    """(hw, win²) flat indices into the PADDED (h+2m)(w+2m) key plane for the
    reference's local2global dense-matmul trick (attention.py:857-900)."""
    m = max_dis
    win = 2 * m + 1
    pw = w + 2 * m
    qy, qx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    dy, dx = np.meshgrid(np.arange(win), np.arange(win), indexing="ij")
    ky = qy.reshape(-1, 1) + dy.reshape(1, -1)   # query pos + offset in pad
    kx = qx.reshape(-1, 1) + dx.reshape(1, -1)
    return (ky * pw + kx).astype(np.int32)


class LocalGatedPropagation(nn.Module):
    """15×15 windowed gated attention (attention.py:723-909).

    qk via unfold (conv_general_dilated_patches); aggregation via the
    reference's own dense local→global scatter + one MXU matmul."""

    d_qk: int
    d_vu: int
    num_head: int
    d_att: int
    max_dis: int = 7
    expand_ratio: float = 2.0

    @nn.compact
    def __call__(self, q, k, v, u, size_2d):
        """q/k: (B, h, w, d_att·heads); v: (B, h, w, Cv); u: (hw, B, Cv)."""
        m = self.max_dis
        win = 2 * m + 1
        B, h, w, _ = q.shape
        expand_d_vu = int(self.d_vu * self.expand_ratio)

        rel_emb = nn.Conv(
            self.num_head * win * win, (1, 1),
            feature_group_count=self.num_head, name="relative_emb_k",
        )(q)  # (B, h, w, heads·win²)

        T = self.d_att ** 0.5
        q = q / T
        # unfold k into win² shifted copies: (B, h, w, C·win²)
        kp = jax.lax.conv_general_dilated_patches(
            k.transpose(0, 3, 1, 2), (win, win), (1, 1),
            [(m, m), (m, m)],
        )  # (B, C*win*win, h, w)
        C = k.shape[-1]
        kp = kp.reshape(B, C, win * win, h, w)
        q_h = q.reshape(B, h, w, self.num_head, self.d_att)
        kp_h = kp.reshape(B, self.num_head, self.d_att, win * win, h, w)
        qk = jnp.einsum("bhwnd,bndphw->bnphw", q_h, kp_h)
        qk = qk + rel_emb.reshape(B, h, w, self.num_head, win * win
                                  ).transpose(0, 3, 4, 1, 2)

        # out-of-frame keys masked (qk_mask, attention.py:806-815)
        ones = jnp.ones((1, 1, h, w))
        valid = jax.lax.conv_general_dilated_patches(
            ones, (win, win), (1, 1), [(m, m), (m, m)]
        ).reshape(1, 1, win * win, h, w)
        qk = qk - (1.0 - valid) * 1e8
        attn = nn.softmax(qk, axis=2)   # over window positions

        # local→global dense matmul: scatter attn into (hw, padded-hw)
        idx = jnp.asarray(_local_scatter_indices(h, w, m))  # (hw, win²)
        attn_f = attn.transpose(0, 1, 3, 4, 2).reshape(
            B, self.num_head, h * w, win * win)
        pad_hw = (h + 2 * m) * (w + 2 * m)

        def scatter_rows(a):  # a: (hw, win²) → (hw, pad_hw)
            z = jnp.zeros((h * w, pad_hw), a.dtype)
            return z.at[jnp.arange(h * w)[:, None], idx].set(a)

        g = jax.vmap(jax.vmap(scatter_rows))(attn_f)  # (B, nh, hw, pad_hw)
        vp = jnp.pad(v, ((0, 0), (m, m), (m, m), (0, 0)))
        vp = vp.reshape(B, pad_hw, self.num_head, expand_d_vu // self.num_head)
        agg = jnp.einsum("bnqp,bpnd->qbnd", g, vp).reshape(h * w, B, -1)

        out = agg * u
        out = DWConv2d(name="dw_conv")(out, (h, w))
        return nn.Dense(self.d_vu, name="projection")(out)


# -------------------------------------------------------------- LSTT block


class GatedPropagationModule(nn.Module):
    """DeAOT dual-branch block (transformer.py:524-697)."""

    cfg: DeAOTConfig
    layer_idx: int

    def setup(self):
        c = self.cfg
        d = c.d_model
        self.expand_d_model = int(d * c.expand_ratio)
        self.norm1 = nn.LayerNorm(epsilon=1e-5)
        self.linear_QV = nn.Dense(c.d_att * c.att_heads + self.expand_d_model)
        self.linear_U = nn.Dense(self.expand_d_model)
        if self.layer_idx == 0:
            self.linear_ID_V = nn.Dense(self.expand_d_model)
        else:
            self.id_norm1 = nn.LayerNorm(epsilon=1e-5)
            self.linear_ID_V = nn.Dense(self.expand_d_model)
            self.linear_ID_U = nn.Dense(self.expand_d_model)
        self.long_term_attn = GatedPropagation(
            d_qk=d, d_vu=2 * d, num_head=c.att_heads, d_att=c.d_att,
            use_linear=False, expand_ratio=c.expand_ratio,
        )
        self.short_term_attn = LocalGatedPropagation(
            d_qk=d, d_vu=2 * d, num_head=c.att_heads, d_att=c.d_att,
            max_dis=c.max_dis, expand_ratio=c.expand_ratio,
        )
        self.norm2 = nn.LayerNorm(epsilon=1e-5)
        self.id_norm2 = nn.LayerNorm(epsilon=1e-5)
        self.self_attn = GatedPropagation(
            d_qk=2 * d, d_vu=2 * d, num_head=c.self_heads, d_att=c.d_att,
            use_linear=True, expand_ratio=c.expand_ratio,
        )

    def fuse_key_value_id(self, value, id_emb):
        """(transformer.py:689-695)."""
        if value is not None:
            return silu(self.linear_ID_V(jnp.concatenate([value, id_emb], -1)))
        return silu(self.linear_ID_V(id_emb))

    def project_qv(self, tgt):
        """norm1 + QV/U projections — shared by forward and memory update."""
        c = self.cfg
        _tgt = self.norm1(tgt)
        qv = self.linear_QV(_tgt)
        curr_Q = qv[..., : c.d_att * c.att_heads]
        curr_V = silu(qv[..., c.d_att * c.att_heads:])
        return _tgt, curr_Q, curr_V

    def __call__(self, tgt, tgt_id, memory, size_2d, long_mask=None):
        """memory: dict with global_K (Tk,B,dk), global_V, global_ID_V,
        local_K/V/ID_V as (B, h, w, ·) planes; or None with curr_id_emb for
        the self-matching reference step."""
        c = self.cfg
        h, w = size_2d
        _tgt, curr_Q, curr_V = self.project_qv(tgt)
        curr_U = self.linear_U(_tgt)

        if tgt_id is None:
            cat_curr_U = jnp.concatenate(
                [silu(curr_U), jnp.ones_like(curr_U)], -1)
            curr_ID_V = None
        else:
            _tgt_id = self.id_norm1(tgt_id)
            curr_ID_V = _tgt_id
            curr_ID_U = self.linear_ID_U(_tgt_id)
            cat_curr_U = silu(jnp.concatenate([curr_U, curr_ID_U], -1))

        if memory.get("curr_id_emb") is not None:
            # reference frame: self-matching (transformer.py:637-645)
            global_K, global_V = curr_Q, curr_V
            global_ID_V = self.fuse_key_value_id(
                curr_ID_V, memory["curr_id_emb"])
            L = h * w
            local_K = global_K.transpose(1, 0, 2).reshape(-1, h, w, global_K.shape[-1])
            local_V = global_V.transpose(1, 0, 2).reshape(-1, h, w, global_V.shape[-1])
            local_ID_V = global_ID_V.transpose(1, 0, 2).reshape(-1, h, w, global_ID_V.shape[-1])
            long_mask = None
        else:
            global_K = memory["global_K"]
            global_V = memory["global_V"]
            global_ID_V = memory["global_ID_V"]
            local_K = memory["local_K"]
            local_V = memory["local_V"]
            local_ID_V = memory["local_ID_V"]

        cat_global_V = jnp.concatenate([global_V, global_ID_V], -1)
        cat_local_V = jnp.concatenate([local_V, local_ID_V], -1)

        tgt2 = self.long_term_attn(
            curr_Q, global_K, cat_global_V, cat_curr_U, size_2d,
            k_mask=long_mask,
        )
        local_Q = curr_Q.transpose(1, 0, 2).reshape(-1, h, w, curr_Q.shape[-1])
        tgt3 = self.short_term_attn(
            local_Q, local_K, cat_local_V, cat_curr_U, size_2d)

        t2, ti2 = jnp.split(tgt2, 2, axis=-1)
        t3, ti3 = jnp.split(tgt3, 2, axis=-1)
        tgt = tgt + t2 + t3
        tgt_id = (0.0 if tgt_id is None else tgt_id) + ti2 + ti3

        _tgt = self.norm2(tgt)
        _tgt_id = self.id_norm2(tgt_id)
        qkvu = jnp.concatenate([_tgt, _tgt_id], -1)
        cat2 = self.self_attn(qkvu, qkvu, qkvu, qkvu, size_2d)
        t2, ti2 = jnp.split(cat2, 2, axis=-1)
        tgt = tgt + t2
        tgt_id = tgt_id + ti2

        new_memory = {
            "curr_K": curr_Q, "curr_V": curr_V, "curr_ID_V": curr_ID_V,
            "global_K": global_K, "global_V": global_V,
            "global_ID_V": global_ID_V,
        }
        return tgt, tgt_id, new_memory


# ------------------------------------------------------------- full model


class DeAOTNet(nn.Module):
    cfg: DeAOTConfig = dataclasses.field(default_factory=DeAOTConfig)

    def setup(self):
        c = self.cfg
        self.encoder = ResNetEncoder(c)
        self.encoder_projector = nn.Conv(c.d_model, (1, 1))
        self.layers = [
            GatedPropagationModule(c, layer_idx=i, name=f"lstt_{i}")
            for i in range(c.lstt_num)
        ]
        # DeAOT default: MODEL_DECODER_INTERMEDIATE_LSTT=False → only the
        # final cat output is normed (GroupNorm1D(2d, groups=2)) and decoded
        self.decoder_norm = nn.GroupNorm(2, epsilon=1e-5, name="decoder_norm")
        self.patch_wise_id_bank = nn.Conv(
            c.d_model, (17, 17), strides=(16, 16), padding=((8, 8), (8, 8)),
        )
        self.id_norm = nn.LayerNorm(epsilon=1e-5)
        # FPN decoder (decode_intermediate_input=False for DeAOT default)
        hd = c.d_model  # ConvGN uses 8 groups (basic.py:67-74)
        self.conv_in = nn.Conv(hd, (1, 1), name="dec_conv_in")
        self.gn_in = nn.GroupNorm(8, epsilon=1e-5, name="dec_gn_in")
        self.conv_16x = nn.Conv(hd, (3, 3), padding=((1, 1),) * 2, name="dec_conv_16x")
        self.gn_16x = nn.GroupNorm(8, epsilon=1e-5, name="dec_gn_16x")
        self.conv_8x = nn.Conv(hd // 2, (3, 3), padding=((1, 1),) * 2, name="dec_conv_8x")
        self.gn_8x = nn.GroupNorm(8, epsilon=1e-5, name="dec_gn_8x")
        self.conv_4x = nn.Conv(hd // 2, (3, 3), padding=((1, 1),) * 2, name="dec_conv_4x")
        self.gn_4x = nn.GroupNorm(8, epsilon=1e-5, name="dec_gn_4x")
        self.adapter_16x = nn.Conv(hd, (1, 1), name="dec_adapter_16x")
        self.adapter_8x = nn.Conv(hd, (1, 1), name="dec_adapter_8x")
        self.adapter_4x = nn.Conv(hd // 2, (1, 1), name="dec_adapter_4x")
        self.conv_out = nn.Conv(c.max_obj_num + 1, (1, 1), name="dec_conv_out")

    def encode_image(self, img):
        """img (B, H, W, 3) ImageNet-normalized → 4 feature levels (NHWC),
        last projected to d_model."""
        xs = self.encoder(img)
        xs[-1] = self.encoder_projector(xs[-1])
        return xs

    def get_id_emb(self, one_hot_mask):
        """(B, H, W, max_obj+1) full-res one-hot → (hw, B, d) id embedding
        (deaot.py:57-63: id bank conv + LayerNorm)."""
        e = self.patch_wise_id_bank(one_hot_mask)
        e = self.id_norm(e)
        B, h, w, d = e.shape
        return e.reshape(B, h * w, d).transpose(1, 0, 2)

    def lstt_forward(self, enc_embs, memories, curr_id_emb, pos_emb, size_2d,
                     long_mask=None):
        """Returns (cat_outputs list, per-layer new memories)."""
        B = enc_embs[-1].shape[0]
        h, w = size_2d
        curr_emb = enc_embs[-1].reshape(B, h * w, -1).transpose(1, 0, 2)
        tgt = curr_emb
        tgt_id = None
        outputs = []
        new_memories = []
        for i, layer in enumerate(self.layers):
            mem = dict(memories[i]) if memories is not None else {}
            if curr_id_emb is not None:
                mem["curr_id_emb"] = curr_id_emb
            if pos_emb is not None and i == 0:
                pass  # self_pos is unused in GPM blocks (no self_pos arg)
            tgt, tgt_id, new_mem = layer(tgt, tgt_id, mem, size_2d, long_mask)
            outputs.append(jnp.concatenate([tgt, tgt_id], -1))
            new_memories.append(new_mem)
        # final GroupNorm1D(2d, groups=2) on the decoded output only
        # (transformer.py:256-266 with intermediate_norm=False)
        outputs[-1] = self._gn1d(self.decoder_norm, outputs[-1])
        return outputs, new_memories

    @staticmethod
    def _gn1d(gn, x):
        """GroupNorm1D (basic.py:11-17): torch GroupNorm(groups, C) over a
        (B, C, L) layout normalizes each group over (C/g, L) — i.e. across
        the whole sequence, not per token."""
        L, B, C = x.shape
        return gn(x.transpose(1, 0, 2)).transpose(1, 0, 2)

    def decode_logits(self, lstt_cat_out, enc_embs, size_2d):
        """FPN head (fpn.py:12-73), decode_intermediate_input=False: input is
        the LAST cat output only."""
        h, w = size_2d
        L, B, C = lstt_cat_out.shape
        x = lstt_cat_out.reshape(h, w, B, C).transpose(2, 0, 1, 3)
        x = nn.relu(self.gn_in(self.conv_in(x)))
        x = nn.relu(self.gn_16x(self.conv_16x(self.adapter_16x(enc_embs[-2]) + x)))
        x = resize_align_corners(x, enc_embs[-3].shape[1:3])
        x = nn.relu(self.gn_8x(self.conv_8x(self.adapter_8x(enc_embs[-3]) + x)))
        x = resize_align_corners(x, enc_embs[-4].shape[1:3])
        x = nn.relu(self.gn_4x(self.conv_4x(self.adapter_4x(enc_embs[-4]) + x)))
        return self.conv_out(x)  # (B, H/4, W/4, max_obj+1)

    def fuse_id_memory(self, layer_idx, curr_V_id, curr_id_emb):
        """Engine hook: per-layer fuse_key_value_id for memory updates."""
        return self.layers[layer_idx].fuse_key_value_id(curr_V_id, curr_id_emb)
