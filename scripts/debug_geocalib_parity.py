"""Bisect GeoCalib net parity divergence (dev tool, not a test)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import torch
import torch.nn.functional as F

from reference_oracle import ref_module, _install_stubs  # noqa

import jax.numpy as jnp

from vipe_tpu.models import convert as mconvert
from vipe_tpu.priors.geocalib.network import GeoCalibNet, MSCAN

gm = ref_module("vipe.priors.geocalib.geocalib")
mm = ref_module("vipe.priors.geocalib.modules")

rng = np.random.default_rng(7)
fixed_bases = torch.from_numpy(rng.random((1, 512, 64)).astype(np.float32))


def fixed_build_bases(self, B, S, D, R, device="cpu"):
    return F.normalize(fixed_bases.repeat(B * S, 1, 1), dim=1)


mm.NMF2D._build_bases = fixed_build_bases

torch.manual_seed(0)
backbone = mm.MSCAN().eval()
ll_enc = gm.LowLevelEncoder().eval()
persp = gm.PerspectiveDecoder().eval()

img_t = torch.rand(1, 3, 64, 96, generator=torch.Generator().manual_seed(1))

acts_t = {}


def hook(name):
    def fn(mod, inp, out):
        acts_t.setdefault(name, out)
    return fn


ud = persp.up_head.decoder
ud.squeeze.register_forward_hook(hook("squeeze"))
ud.hamburger.register_forward_hook(hook("hamburger"))
ud.align.register_forward_hook(hook("align"))
ud.out_conv.register_forward_hook(hook("out_conv"))
ud.ll_fusion.register_forward_hook(hook("ll_fusion"))

with torch.no_grad():
    hl_t = backbone({"image": img_t})["features"]
    ll_t = ll_enc({"image": img_t})["features"]
    out_t = persp({"features": {"hl": hl_t, "ll": ll_t}})

sd = {}
for mod, pre in ((backbone, "backbone"), (ll_enc, "ll_enc"),
                 (persp, "perspective_decoder")):
    for k, v in mod.state_dict().items():
        sd[f"{pre}.{k}"] = v
variables = mconvert.convert_geocalib(sd)

bases_j = jnp.asarray(
    (fixed_bases / fixed_bases.norm(dim=1, keepdim=True)).numpy()
)
img_j = jnp.asarray(img_t.numpy().transpose(0, 2, 3, 1))

net = GeoCalibNet()

# capture intermediates on the flax side
acts_j = {}
_orig = {}
import vipe_tpu.priors.geocalib.network as N


def cmp(name, j, t, hwc_to_chw=True):
    j = np.asarray(j)
    t = t.numpy() if hasattr(t, "numpy") else t
    if hwc_to_chw and j.ndim == 4:
        j = j.transpose(0, 3, 1, 2)
    d = np.abs(j - t)
    print(f"{name:24s} maxabs={d.max():.3e} mean={d.mean():.3e} "
          f"shape={j.shape} vs {t.shape}")


# --- backbone stages
mbvars = {"params": variables["params"]["backbone"],
          "batch_stats": variables["batch_stats"]["backbone"]}
outs_j = MSCAN().apply(mbvars, img_j)
for i in range(4):
    cmp(f"backbone stage{i}", outs_j[i], hl_t[i].permute(0, 2, 3, 1),
        hwc_to_chw=False)

# --- ll encoder
from vipe_tpu.priors.geocalib.network import ConvModule
ll_j = ConvModule(64, kernel=3).apply(
    {"params": variables["params"]["ll_conv1"]}, img_j)
ll_j = ConvModule(64, kernel=3).apply(
    {"params": variables["params"]["ll_conv2"]}, ll_j)
cmp("ll", ll_j, ll_t.permute(0, 2, 3, 1), hwc_to_chw=False)

# --- up decoder path piecewise
import jax
updec = variables["params"]["up_decoder"]
hl_j = [jnp.asarray(f.numpy().transpose(0, 2, 3, 1)) for f in hl_t]
ll_jt = jnp.asarray(ll_t.numpy().transpose(0, 2, 3, 1))
target_hw = hl_j[0].shape[1:3]
ups = [jax.image.resize(f, (f.shape[0],) + tuple(target_hw) + (f.shape[-1],),
                        "bilinear") for f in hl_j]
x = jnp.concatenate(ups, axis=-1)

# compare against torch's interpolate of the same
ups_t = [F.interpolate(level, size=hl_t[0].shape[2:], mode="bilinear",
                       align_corners=False) for level in hl_t]
x_t = torch.cat(ups_t, dim=1)
cmp("concat-ups", x, x_t.permute(0, 2, 3, 1), hwc_to_chw=False)

x = ConvModule(512).apply({"params": updec["squeeze"]}, x)
cmp("squeeze", x, acts_t["squeeze"])

from vipe_tpu.priors.geocalib.network import Hamburger
x = Hamburger(512).apply({"params": updec["hamburger"]}, x, bases_j)
cmp("hamburger", x, acts_t["hamburger"])

x = ConvModule(64).apply({"params": updec["align"]}, x)
cmp("align", x, acts_t["align"])

B, H, W, C = x.shape
f2 = jax.image.resize(x, (B, 2 * H, 2 * W, C), "bilinear")
f2 = ConvModule(64, kernel=3, use_bias=False).apply(
    {"params": updec["out_conv"]}, f2)
cmp("out_conv", f2, acts_t["out_conv"])

from vipe_tpu.priors.geocalib.network import ResidualConvUnit
f4 = jax.image.resize(f2, (B, 4 * H, 4 * W, C), "bilinear")
fused = f4 + ResidualConvUnit(64).apply({"params": updec["ll_rcu1"]}, ll_jt)
fused = ResidualConvUnit(64).apply({"params": updec["ll_rcu2"]}, fused)
cmp("ll_fusion", fused, acts_t["ll_fusion"])
