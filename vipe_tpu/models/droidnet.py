"""DroidNet (feature/context encoders + ConvGRU update operator) in flax.

Architecture parity with the reference
``/root/reference/vipe/slam/networks/droid_net.py:179-553`` (itself derived
from DROID-SLAM), re-expressed NHWC/flax for TPU:

  * ``BasicEncoder``: 7×7 s2 stem (3→32) + 3 residual stages (32/64/128,
    strides 1/2/2, two blocks each) + 1×1 head → 1/8-res features.
    fnet: output 128, instance norm.  cnet: output 256, no norm, split into
    net (tanh) / inp (relu) 128+128.
  * ``ConvGRU`` with global-context gates (1×1 convs on the sigmoid-gated
    spatial mean, droid_net.py:373-400).
  * ``UpdateModule``: corr encoder (4·49=196 ch in), flow encoder (4 ch in),
    GRU (h=128, i=320), delta/weight heads (2 ch, sliced from the 3-ch
    checkpoint at load time like droid_net.py:547-550), ``GraphAgg`` damping
    head (softplus ·0.01).

Weight conversion from the public ``droid.pth`` checkpoint is in
``vipe_tpu.models.convert`` (torch → flax param tree); random init otherwise.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

DIM = 32
CORR_PLANES = 4 * (2 * 3 + 1) ** 2  # 196

IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])


def instance_norm(x, eps: float = 1e-5):
    """torch nn.InstanceNorm2d(affine=False) over NHWC: normalize per (N, C)."""
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class ResidualBlock(nn.Module):
    planes: int
    norm_fn: str = "instance"
    stride: int = 1
    dtype: object = jnp.bfloat16

    def _norm(self, x):
        if self.norm_fn == "instance":
            return instance_norm(x)
        if self.norm_fn == "none":
            return x
        raise ValueError(self.norm_fn)

    @nn.compact
    def __call__(self, x):
        # torch pad=1 (droid_net.py:183); under stride 2 XLA 'SAME' would
        # pad (0,1) instead of (1,1) — a one-pixel grid shift vs checkpoints
        y = nn.Conv(self.planes, (3, 3), strides=self.stride,
                    padding=((1, 1), (1, 1)), name="conv1", dtype=self.dtype)(x)
        y = nn.relu(self._norm(y))
        y = nn.Conv(self.planes, (3, 3), name="conv2", dtype=self.dtype)(y)
        y = nn.relu(self._norm(y))
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(self.planes, (1, 1), strides=self.stride, name="downsample", dtype=self.dtype)(x)
            x = self._norm(x)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    output_dim: int = 128
    norm_fn: str = "instance"
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) ImageNet-normalized → (B, H/8, W/8, output_dim)."""
        # torch pad=3 (droid_net.py:308); explicit — 'SAME' differs at stride 2
        x = nn.Conv(DIM, (7, 7), strides=2, padding=((3, 3), (3, 3)),
                    name="conv1", dtype=self.dtype)(x)
        if self.norm_fn == "instance":
            x = instance_norm(x)
        x = nn.relu(x)
        for i, (dim, stride) in enumerate([(DIM, 1), (2 * DIM, 2), (4 * DIM, 2)]):
            x = ResidualBlock(dim, self.norm_fn, stride, dtype=self.dtype, name=f"layer{i + 1}_0")(x)
            x = ResidualBlock(dim, self.norm_fn, 1, dtype=self.dtype, name=f"layer{i + 1}_1")(x)
        return nn.Conv(self.output_dim, (1, 1), name="conv2", dtype=self.dtype)(x)


class ConvGRU(nn.Module):
    h_planes: int = 128
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, net, inp):
        """net: (B, H, W, 128) hidden; inp: (B, H, W, i_planes)."""
        net_inp = jnp.concatenate([net, inp], axis=-1)
        glo = jax.nn.sigmoid(nn.Conv(self.h_planes, (1, 1), name="w", dtype=self.dtype)(net)) * net
        glo = glo.mean(axis=(1, 2), keepdims=True)  # (B,1,1,128)

        z = jax.nn.sigmoid(
            nn.Conv(self.h_planes, (3, 3), name="convz", dtype=self.dtype)(net_inp)
            + nn.Conv(self.h_planes, (1, 1), name="convz_glo", dtype=self.dtype)(glo)
        )
        r = jax.nn.sigmoid(
            nn.Conv(self.h_planes, (3, 3), name="convr", dtype=self.dtype)(net_inp)
            + nn.Conv(self.h_planes, (1, 1), name="convr_glo", dtype=self.dtype)(glo)
        )
        q = jnp.tanh(
            nn.Conv(self.h_planes, (3, 3), name="convq", dtype=self.dtype)(
                jnp.concatenate([r * net, inp], axis=-1)
            )
            + nn.Conv(self.h_planes, (1, 1), name="convq_glo", dtype=self.dtype)(glo)
        )
        return (1 - z) * net + z * q


class GraphAgg(nn.Module):
    """Edge → per-source-frame aggregation producing BA damping eta.

    The reference also predicts an upsampling mask (droid_net.py:412,427)
    which ViPE never consumes; we drop that head (the converter skips its
    checkpoint keys).
    """

    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, net, ix, num_frames: int):
        """net: (E, H, W, 128) hidden states; ix: (E,) source frame index."""
        net = nn.relu(nn.Conv(128, (3, 3), name="conv1", dtype=self.dtype)(net))
        # scatter_mean over edges per source frame (reference scatter_mean)
        ones = jnp.ones((net.shape[0],), net.dtype)
        counts = jax.ops.segment_sum(ones, ix, num_segments=num_frames)
        summed = jax.ops.segment_sum(net, ix, num_segments=num_frames)
        net = summed / jnp.maximum(counts, 1.0)[:, None, None, None]
        net = nn.relu(nn.Conv(128, (3, 3), name="conv2", dtype=self.dtype)(net))
        eta = jax.nn.softplus(nn.Conv(1, (3, 3), name="eta", dtype=self.dtype)(net).astype(jnp.float32))
        return 0.01 * eta[..., 0]  # (num_frames, H, W)


class UpdateModule(nn.Module):
    # bf16 compute, f32 outputs — the reference runs the whole update under
    # CUDA fp16 autocast (droid_net.py @autocast); the GRU convs are ~350
    # GFLOP per fused round and dominate the frontend at f32
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, net, inp, corr, flow, ix=None, num_frames: int = 0):
        """One RAFT-SLAM update.

        net/inp: (E, H, W, 128); corr: (E, H, W, 196); flow: (E, H, W, 4).
        Returns (net', delta (E,H,W,2), weight (E,H,W,2)[, eta (N,H,W)]).
        """
        c = nn.relu(nn.Conv(128, (1, 1), name="corr_enc1", dtype=self.dtype)(corr))
        c = nn.relu(nn.Conv(128, (3, 3), name="corr_enc2", dtype=self.dtype)(c))
        f = nn.relu(nn.Conv(128, (7, 7), name="flow_enc1", dtype=self.dtype)(flow))
        f = nn.relu(nn.Conv(64, (3, 3), name="flow_enc2", dtype=self.dtype)(f))

        gru_inp = jnp.concatenate([inp, c, f], axis=-1)
        net = ConvGRU(dtype=self.dtype, name="gru")(net, gru_inp)

        d = nn.relu(nn.Conv(128, (3, 3), name="delta1", dtype=self.dtype)(net))
        delta = nn.Conv(2, (3, 3), name="delta2", dtype=self.dtype)(d).astype(jnp.float32)
        wgt = nn.relu(nn.Conv(128, (3, 3), name="weight1", dtype=self.dtype)(net))
        weight = jax.nn.sigmoid(
            nn.Conv(2, (3, 3), name="weight2", dtype=self.dtype)(wgt)
            .astype(jnp.float32)
        )

        if ix is not None:
            eta = GraphAgg(dtype=self.dtype, name="agg")(net, ix, num_frames)
            return net.astype(jnp.float32), delta, weight, eta
        return net.astype(jnp.float32), delta, weight


class DroidNet(nn.Module):
    """Container exposing the three sub-networks as flax methods."""

    dtype: object = jnp.bfloat16

    def setup(self):
        self.fnet = BasicEncoder(output_dim=128, norm_fn="instance",
                                 dtype=self.dtype)
        self.cnet = BasicEncoder(output_dim=256, norm_fn="none",
                                 dtype=self.dtype)
        self.update = UpdateModule(dtype=self.dtype)

    def encode_features(self, images):
        """images: (B, H, W, 3) RGB — uint8 or float in [0, 1] →
        (B, H/8, W/8, 128).  uint8 input keeps the host→device transfer 4×
        smaller; normalization happens on device."""
        if images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) / 255.0
        x = (images - IMAGENET_MEAN) / IMAGENET_STD
        return self.fnet(x)

    def encode_context(self, images):
        """→ (net tanh, inp relu), each (B, H/8, W/8, 128)."""
        if images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) / 255.0
        x = (images - IMAGENET_MEAN) / IMAGENET_STD
        out = self.cnet(x)
        net, inp = jnp.split(out, 2, axis=-1)
        return jnp.tanh(net), nn.relu(inp)

    def __call__(self, images, corr, flow, ix=None, num_frames: int = 0):
        """Wire-up for init: runs all submodules once."""
        fmap = self.encode_features(images)
        net, inp = self.encode_context(images)
        return self.update(net, inp, corr, flow, ix, num_frames)


def init_droidnet(rng_key, ht: int = 48, wd: int = 64):
    """Initialize DroidNet params with dummy shapes (random weights)."""
    model = DroidNet()
    images = jnp.zeros((1, ht * 8, wd * 8, 3))
    corr = jnp.zeros((1, ht, wd, CORR_PLANES))
    flow = jnp.zeros((1, ht, wd, 4))
    ix = jnp.zeros((1,), jnp.int32)
    params = model.init(rng_key, images, corr, flow, ix, 1)
    return model, params
