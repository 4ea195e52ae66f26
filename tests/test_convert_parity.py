"""Numeric parity tests for the torch→flax weight-layout converters.

These guard the layout/flip conventions in vipe_tpu/models/convert.py against
the actual torch ops they claim to convert from — the first line of defence
for checkpoint activation parity once real weights load (torch is CPU-only in
this image, which is all these need).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
from flax import linen as nn

from vipe_tpu.models import convert


def _rand(*shape):
    return np.random.default_rng(0).standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize("k,s", [(2, 2), (4, 4), (3, 1)])
def test_convtranspose_parity(k, s):
    cin, cout, H, W = 5, 7, 6, 6
    tmod = torch.nn.ConvTranspose2d(cin, cout, k, stride=s)
    x = _rand(1, cin, H, W)
    with torch.no_grad():
        ref = tmod(torch.from_numpy(x)).numpy()

    sd = {f"up.{n}": p.detach().numpy() for n, p in tmod.named_parameters()}
    params = convert._convt(sd, "up")
    fmod = nn.ConvTranspose(cout, (k, k), strides=(s, s), padding="VALID")
    y = fmod.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    got = np.asarray(y).transpose(0, 3, 1, 2)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_conv_parity():
    cin, cout = 4, 6
    tmod = torch.nn.Conv2d(cin, cout, 3, stride=1, padding=1)
    x = _rand(1, cin, 8, 8)
    with torch.no_grad():
        ref = tmod(torch.from_numpy(x)).numpy()
    sd = {f"c.{n}": p.detach().numpy() for n, p in tmod.named_parameters()}
    params = convert._conv_entry(sd, "c")
    fmod = nn.Conv(cout, (3, 3), padding=((1, 1), (1, 1)))
    y = fmod.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(y).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-4
    )


def test_linear_parity():
    tmod = torch.nn.Linear(5, 3)
    x = _rand(2, 5)
    with torch.no_grad():
        ref = tmod(torch.from_numpy(x)).numpy()
    sd = {f"l.{n}": p.detach().numpy() for n, p in tmod.named_parameters()}
    params = convert._lin(sd, "l")
    y = jnp.asarray(x) @ params["kernel"] + params["bias"]
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------- op parity
# Beyond weight layout: the numeric semantics of every op family the ports
# rely on, checked against the torch op the reference actually calls.  These
# are the conversion footguns that silently break activation parity.


def test_instance_norm_parity():
    """droidnet.instance_norm vs torch InstanceNorm2d(affine=False)
    (reference droid_net.py fnet 'instance' norm)."""
    from vipe_tpu.models.droidnet import instance_norm

    x = _rand(2, 5, 6, 7)  # NCHW
    with torch.no_grad():
        ref = torch.nn.InstanceNorm2d(5)(torch.from_numpy(x)).numpy()
    got = np.asarray(instance_norm(jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(
        got.transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-5
    )


def test_layernorm_converter_parity():
    tmod = torch.nn.LayerNorm(6)
    with torch.no_grad():
        tmod.weight.mul_(1.3).add_(0.1)
        tmod.bias.add_(0.2)
        x = _rand(3, 6)
        ref = tmod(torch.from_numpy(x)).numpy()
    sd = {f"n.{k}": v.detach().numpy() for k, v in tmod.named_parameters()}
    params = convert._ln(sd, "n")
    y = nn.LayerNorm(epsilon=1e-5).apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-5)


def test_batchnorm_eval_parity():
    """Running-stats BatchNorm conversion (geocalib bn() layout: params
    scale/bias + batch_stats mean/var) vs torch eval-mode BatchNorm2d."""
    tmod = torch.nn.BatchNorm2d(4)
    with torch.no_grad():
        tmod.weight.mul_(1.7).add_(0.3)
        tmod.bias.add_(-0.2)
        tmod.running_mean.add_(0.5)
        tmod.running_var.mul_(2.0)
    tmod.eval()
    x = _rand(2, 4, 5, 5)
    with torch.no_grad():
        ref = tmod(torch.from_numpy(x)).numpy()
    variables = {
        "params": {"scale": tmod.weight.detach().numpy(),
                   "bias": tmod.bias.detach().numpy()},
        "batch_stats": {"mean": tmod.running_mean.numpy(),
                        "var": tmod.running_var.numpy()},
    }
    y = nn.BatchNorm(use_running_average=True, epsilon=1e-5).apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        np.asarray(y).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("out_hw", [(9, 13), (4, 5), (16, 24)])
def test_resize_align_corners_parity(out_hw):
    """resize_align_corners vs F.interpolate(align_corners=True) — used by
    DeAOT, UniDepth final resize, DPT taps."""
    from vipe_tpu.priors.track_anything.deaot.network import (
        resize_align_corners,
    )

    x = _rand(1, 3, 8, 12)
    with torch.no_grad():
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x), size=out_hw, mode="bilinear",
            align_corners=True,
        ).numpy()
    got = np.asarray(
        resize_align_corners(jnp.asarray(x.transpose(0, 2, 3, 1)), out_hw)
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("out_hw", [(9, 13), (16, 24)])
def test_resize_half_pixel_parity(out_hw):
    """jax.image.resize('linear') matches F.interpolate(align_corners=False)
    (half-pixel centers) — the default torch upsampling elsewhere."""
    x = _rand(1, 3, 8, 12)
    with torch.no_grad():
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x), size=out_hw, mode="bilinear",
            align_corners=False,
        ).numpy()
    got = np.asarray(jax.image.resize(
        jnp.asarray(x), (1, 3) + out_hw, "linear"
    ))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_avg_pool_count_include_pad_parity():
    """metric3d _pool2x vs torch F.avg_pool2d(x, 3, 2, 1) default
    count_include_pad=True (decoder slow-fast GRU downsample)."""
    from vipe_tpu.priors.depth.metric3d import _pool2x

    x = _rand(1, 4, 9, 11)
    with torch.no_grad():
        ref = torch.nn.functional.avg_pool2d(
            torch.from_numpy(x), 3, stride=2, padding=1
        ).numpy()
    got = np.asarray(_pool2x(jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(
        got.transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-5
    )


def test_gelu_parity():
    """nn.gelu(approximate=False) vs torch default (erf) GELU — ViT MLPs."""
    x = _rand(64)
    with torch.no_grad():
        ref = torch.nn.functional.gelu(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(
        np.asarray(nn.gelu(jnp.asarray(x), approximate=False)),
        ref, rtol=1e-5, atol=1e-6,
    )
    with torch.no_grad():
        ref_t = torch.nn.functional.gelu(
            torch.from_numpy(x), approximate="tanh"
        ).numpy()
    np.testing.assert_allclose(
        np.asarray(nn.gelu(jnp.asarray(x), approximate=True)),
        ref_t, rtol=1e-4, atol=1e-5,
    )


def test_sdpa_parity():
    """jax.nn.dot_product_attention vs torch scaled_dot_product_attention
    (models/vit.py attention core)."""
    B, N, H, D = 2, 7, 3, 8
    q = _rand(B, N, H, D)
    k = _rand(B, N, H, D)
    v = _rand(B, N, H, D)
    with torch.no_grad():
        ref = torch.nn.functional.scaled_dot_product_attention(
            torch.from_numpy(q.transpose(0, 2, 1, 3)),
            torch.from_numpy(k.transpose(0, 2, 1, 3)),
            torch.from_numpy(v.transpose(0, 2, 1, 3)),
        ).numpy().transpose(0, 2, 1, 3)
    got = np.asarray(jax.nn.dot_product_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    ))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
