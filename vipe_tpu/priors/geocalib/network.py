"""GeoCalib network: MSCAN backbone + LightHamHead decoders (flax).

Reference: /root/reference/vipe/priors/geocalib/modules.py:23-620 and
geocalib.py:28-133.  The net predicts an up-vector field, a latitude field
and per-pixel confidences that feed the LM optimizer
(vipe_tpu.priors.geocalib.optimizer).

MSCAN (SegNeXt): stem + 3 overlap patch embeds, stages of large-kernel strip
convolutional attention blocks (dims 64/128/320/512, depths 3/3/12/3).
LightHamHead: concat-upsampled stage features → 1×1 squeeze → Hamburger
(NMF matrix-decomposition attention, 7 multiplicative-update steps at eval)
→ align → fuse with a low-level 2-conv encoder → per-task 1×1 heads.
BatchNorms run in inference mode (running statistics from the checkpoint).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvModule(nn.Module):
    """conv (+ReLU) (modules.py:23-56; use_norm=False throughout GeoCalib)."""

    out: int
    kernel: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out, (self.kernel, self.kernel),
                    use_bias=self.use_bias, name="conv")(x)
        return nn.relu(x)


class BN(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(use_running_average=True, name="bn")(x)


class DWConv(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.dim, (3, 3), feature_group_count=self.dim,
                       name="dwconv")(x)


class MscanMlp(nn.Module):
    dim: int
    hidden: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.hidden, (1, 1), name="fc1")(x)
        x = DWConv(self.hidden, name="dwconv")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Conv(self.dim, (1, 1), name="fc2")(x)


class AttentionModule(nn.Module):
    """Large-kernel strip-conv attention (modules.py:408-446)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        d = self.dim
        u = x
        attn = nn.Conv(d, (5, 5), feature_group_count=d, name="conv0")(x)
        a0 = nn.Conv(d, (1, 7), feature_group_count=d, name="conv0_1")(attn)
        a0 = nn.Conv(d, (7, 1), feature_group_count=d, name="conv0_2")(a0)
        a1 = nn.Conv(d, (1, 11), feature_group_count=d, name="conv1_1")(attn)
        a1 = nn.Conv(d, (11, 1), feature_group_count=d, name="conv1_2")(a1)
        a2 = nn.Conv(d, (1, 21), feature_group_count=d, name="conv2_1")(attn)
        a2 = nn.Conv(d, (21, 1), feature_group_count=d, name="conv2_2")(a2)
        attn = attn + a0 + a1 + a2
        attn = nn.Conv(d, (1, 1), name="conv3")(attn)
        return attn * u


class MscanBlock(nn.Module):
    dim: int
    mlp_ratio: float

    @nn.compact
    def __call__(self, x):
        d = self.dim
        ls1 = self.param("layer_scale_1", nn.initializers.constant(1e-2), (d,))
        ls2 = self.param("layer_scale_2", nn.initializers.constant(1e-2), (d,))
        y = nn.BatchNorm(use_running_average=True, name="norm1")(x)
        shortcut = y  # SpatialAttention's own residual (modules.py:464-472)
        y = nn.Conv(d, (1, 1), name="attn_proj1")(y)
        y = nn.gelu(y, approximate=False)
        y = AttentionModule(d, name="attn_gate")(y)
        y = nn.Conv(d, (1, 1), name="attn_proj2")(y)
        x = x + ls1 * (y + shortcut)
        y = nn.BatchNorm(use_running_average=True, name="norm2")(x)
        y = MscanMlp(d, int(d * self.mlp_ratio), name="mlp")(y)
        return x + ls2 * y


class MSCAN(nn.Module):
    embed_dims: Sequence[int] = (64, 128, 320, 512)
    depths: Sequence[int] = (3, 3, 12, 3)
    mlp_ratios: Sequence[float] = (8, 8, 4, 4)

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) RGB in [0,1] → 4 stage features at /4 /8 /16 /32.

        The reference feeds BGR·255 (modules.py:608); we replicate.
        """
        x = x[..., ::-1] * 255.0
        outs = []
        for i in range(4):
            d = self.embed_dims[i]
            if i == 0:
                # torch k3/s2/p1 (modules.py:381-396) — explicit padding;
                # XLA 'SAME' pads (0,1) at stride 2, shifting the grid
                x = nn.Conv(d // 2, (3, 3), strides=2,
                            padding=((1, 1), (1, 1)), name="stem_conv1")(x)
                x = nn.BatchNorm(use_running_average=True, name="stem_bn1")(x)
                x = nn.gelu(x, approximate=False)
                x = nn.Conv(d, (3, 3), strides=2,
                            padding=((1, 1), (1, 1)), name="stem_conv2")(x)
                x = nn.BatchNorm(use_running_average=True, name="stem_bn2")(x)
            else:
                # torch OverlapPatchEmbed k3/s2/p1 (modules.py:547-553)
                x = nn.Conv(d, (3, 3), strides=2,
                            padding=((1, 1), (1, 1)),
                            name=f"patch_embed{i + 1}")(x)
                x = nn.BatchNorm(use_running_average=True,
                                 name=f"patch_bn{i + 1}")(x)
            for b in range(self.depths[i]):
                x = MscanBlock(d, self.mlp_ratios[i],
                               name=f"stage{i + 1}_block{b}")(x)
            # torch nn.LayerNorm eps default is 1e-5 (flax default 1e-6)
            x = nn.LayerNorm(epsilon=1e-5, name=f"norm{i + 1}")(x)
            outs.append(x)
        return outs


def nmf2d(x, r: int = 64, steps: int = 7, key=None, bases=None):
    """Non-negative matrix factorization attention (modules.py:128-208).

    x: (B, N, D) non-negative.  Multiplicative updates; random bases are
    drawn from a FIXED key (the reference draws fresh uniform bases per
    forward even at eval — we keep inference deterministic).  ``bases``
    ((B, D, r), pre-normalized) overrides the draw — parity tests inject
    the oracle's bases through it.
    """
    B, N, D = x.shape
    xT = jnp.swapaxes(x, 1, 2)  # (B, D, N)
    if bases is None:
        if key is None:
            key = jax.random.PRNGKey(42)
        bases = jax.random.uniform(key, (B, D, r))
        bases = bases / jnp.maximum(
            jnp.linalg.norm(bases, axis=1, keepdims=True), 1e-6
        )
    coef = jax.nn.softmax(jnp.einsum("bdn,bdr->bnr", xT, bases), axis=-1)

    def step(carry, _):
        bases, coef = carry
        num = jnp.einsum("bdn,bdr->bnr", xT, bases)
        den = coef @ (jnp.swapaxes(bases, 1, 2) @ bases)
        coef = coef * num / (den + 1e-6)
        num = jnp.einsum("bdn,bnr->bdr", xT, coef)
        den = bases @ (jnp.swapaxes(coef, 1, 2) @ coef)
        bases = bases * num / (den + 1e-6)
        return (bases, coef), None

    (bases, coef), _ = jax.lax.scan(step, (bases, coef), None, length=steps)
    num = jnp.einsum("bdn,bdr->bnr", xT, bases)
    den = coef @ (jnp.swapaxes(bases, 1, 2) @ bases)
    coef = coef * num / (den + 1e-6)
    out = jnp.einsum("bdr,bnr->bnd", bases, coef)
    return out


class Hamburger(nn.Module):
    ham_channels: int = 512

    @nn.compact
    def __call__(self, x, nmf_bases=None):
        B, H, W, C = x.shape
        y = ConvModule(self.ham_channels, name="ham_in")(x)
        y = nmf2d(
            nn.relu(y).reshape(B, H * W, C), bases=nmf_bases
        ).reshape(B, H, W, C)
        y = ConvModule(self.ham_channels, name="ham_out")(y)
        return nn.relu(x + y)


class ResidualConvUnit(nn.Module):
    """modules.py:59-85.  The reference's first ReLU is inplace=True and so
    MUTATES its input — the `out + x` at the end adds relu(x), not x.  We
    replicate that exactly (it changes rcu2, whose input can be negative)."""

    features: int

    @nn.compact
    def __call__(self, x):
        y0 = nn.relu(x)
        y = nn.Conv(self.features, (3, 3), name="conv1")(y0)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), name="conv2")(y)
        return y0 + y


class LightHamHead(nn.Module):
    """HamNet decoder (modules.py:237-316) + low-level fusion."""

    out_channels: int = 64
    ham_channels: int = 512

    @nn.compact
    def __call__(self, hl_feats, ll_feat, nmf_bases=None):
        target_hw = hl_feats[0].shape[1:3]
        ups = [
            jax.image.resize(f, (f.shape[0],) + tuple(target_hw) + (f.shape[-1],),
                             "bilinear")
            for f in hl_feats
        ]
        x = jnp.concatenate(ups, axis=-1)
        x = ConvModule(self.ham_channels, name="squeeze")(x)
        x = Hamburger(self.ham_channels, name="hamburger")(x, nmf_bases)
        feats = ConvModule(self.out_channels, name="align")(x)

        B, H, W, C = feats.shape
        feats = jax.image.resize(feats, (B, 2 * H, 2 * W, C), "bilinear")
        feats = ConvModule(self.out_channels, kernel=3, use_bias=False,
                           name="out_conv")(feats)
        feats = jax.image.resize(feats, (B, 4 * H, 4 * W, C), "bilinear")
        # FeatureFusionBlock(upsample=False) with the low-level features
        feats = feats + ResidualConvUnit(self.out_channels, name="ll_rcu1")(ll_feat)
        feats = ResidualConvUnit(self.out_channels, name="ll_rcu2")(feats)

        unc = ConvModule(self.out_channels, kernel=3, use_bias=False,
                         name="unc_conv")(feats)
        unc = nn.Conv(1, (1, 1), name="unc_pred")(unc)[..., 0]
        return feats, unc


class GeoCalibNet(nn.Module):
    """Backbone + low-level encoder + up/latitude decoders (geocalib.py:28-103)."""

    @nn.compact
    def __call__(self, image, nmf_bases=None):
        hl = MSCAN(name="backbone")(image)
        ll = ConvModule(64, kernel=3, name="ll_conv1")(image)
        ll = ConvModule(64, kernel=3, name="ll_conv2")(ll)

        up_feats, up_logconf = LightHamHead(name="up_decoder")(
            hl, ll, nmf_bases
        )
        up = nn.Conv(2, (1, 1), name="linear_pred_up")(up_feats)
        up = up / jnp.maximum(jnp.linalg.norm(up, axis=-1, keepdims=True), 1e-12)

        lat_feats, lat_logconf = LightHamHead(name="lat_decoder")(
            hl, ll, nmf_bases
        )
        lat = nn.Conv(1, (1, 1), name="linear_pred_latitude")(lat_feats)
        # latitude = asin(clamp(tanh(x))) (reference geocalib.py:84-87) —
        # same (-π/2, π/2) range as tanh·π/2 but a different curve
        eps = 1e-5
        lat = jnp.arcsin(jnp.clip(jnp.tanh(lat[..., 0]), -1 + eps, 1 - eps))

        return dict(
            up_field=up,
            up_confidence=jax.nn.sigmoid(up_logconf),
            latitude_field=lat,
            latitude_confidence=jax.nn.sigmoid(lat_logconf),
        )
