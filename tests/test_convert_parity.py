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
