"""Import the reference's torch modules as ACTIVATION ORACLES for converter
parity tests.

The reference tree (/root/reference, read-only) is pure torch on the model
side; its compiled CUDA extension and a few absent third-party packages are
only touched at package-import or download time, never inside the forwards
we test.  We pre-seed ``sys.modules`` with minimal stubs so the real model
code imports on CPU, then instantiate reference modules with random weights,
run their ``state_dict()`` through ``vipe_tpu.models.convert`` and compare
activations against our flax rewrites.  This is the strongest parity
evidence available without real checkpoints: same weights, same inputs,
same outputs — and it exercises the exact key layout released checkpoints
will have.

Tests using this helper must call ``ref_module(...)`` which skips when the
reference tree is absent.
"""

from __future__ import annotations

import importlib
import importlib.abc
import importlib.util
import os
import sys
import types

import pytest

REF_ROOT = os.environ.get("VIPE_REFERENCE_ROOT", "/root/reference")

_installed = False


class _DictConfig(dict):
    """Attribute-access view of nested dicts (omegaconf stand-in)."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:  # bare `except:` sites in the reference
            raise AttributeError(k) from e
        return _DictConfig(v) if isinstance(v, dict) else v


class _AnyAttr:
    """Permissive namespace: any attribute resolves to a no-op callable —
    used for the compiled extension handle, which model __init__/forwards
    never actually call in the code paths under test."""

    def __getattr__(self, k):
        return lambda *a, **kw: None


class _StubLoader(importlib.abc.MetaPathFinder, importlib.abc.Loader):
    """Meta-path finder/loader: any not-yet-registered submodule of a
    stubbed package resolves to a fresh permissive stub module."""

    PREFIXES = ("torchvision.", "kornia.", "timm.")

    def find_spec(self, fullname, path=None, target=None):
        if any(fullname.startswith(p) for p in self.PREFIXES):
            return importlib.util.spec_from_loader(
                fullname, self, is_package=True
            )
        return None

    def create_module(self, spec):
        mod = types.ModuleType(spec.name)
        mod.__file__ = "<stub>"
        mod.__path__ = []

        def _getattr(k):
            if k.startswith("__"):
                raise AttributeError(k)
            return _AnyAttr()

        mod.__getattr__ = _getattr
        return mod

    def exec_module(self, module):
        pass


def _install_stubs():
    global _installed
    if _installed:
        return
    sys.meta_path.append(_StubLoader())

    om = types.ModuleType("omegaconf")
    om.DictConfig = _DictConfig
    om.ListConfig = list
    om.MISSING = object()

    class OmegaConf:
        _res = {}

        @classmethod
        def has_resolver(cls, n):
            return n in cls._res

        @classmethod
        def register_new_resolver(cls, n, f):
            cls._res[n] = f

        @classmethod
        def create(cls, obj=None):
            return _DictConfig(obj or {})

    om.OmegaConf = OmegaConf
    sys.modules.setdefault("omegaconf", om)

    # the compiled extension: vipe/ext/__init__.py does `import vipe_ext`
    # and falls back to a torch cpp_extension JIT build (no CUDA here) —
    # pre-seeding the import makes it bind our permissive handle instead
    fake_c = types.ModuleType("vipe_ext")
    for sub in (
        "droid_net_ext", "grounding_dino_ext", "utils_ext", "slam_ext",
        "scatter_ext", "lietorch_ext", "corr_ext",
    ):
        setattr(fake_c, sub, _AnyAttr())
    sys.modules.setdefault("vipe_ext", fake_c)

    # download helper, only used to fetch weights
    gdown = types.ModuleType("gdown")
    gdown.download = lambda *a, **kw: None
    sys.modules.setdefault("gdown", gdown)

    # torchvision: the modules under test import only transforms.Compose /
    # functional resize helpers for PREPROCESSING, never in forward
    tv = types.ModuleType("torchvision")
    tv.__path__ = []  # package-like so `import torchvision.x` resolves
    tv.__version__ = "0.15.0"
    tv.__spec__ = importlib.util.spec_from_loader(
        "torchvision", loader=None, is_package=True
    )
    tvt = types.ModuleType("torchvision.transforms")

    class Compose:
        def __init__(self, fns):
            self.fns = fns

        def __call__(self, x):
            for f in self.fns:
                x = f(x)
            return x

    tvt.Compose = Compose
    tvt.__path__ = []  # mark as package so submodules can be imported
    def _stub_module(name: str) -> types.ModuleType:
        mod = types.ModuleType(name)
        mod.__file__ = "<stub>"
        mod.__path__ = []  # package-like, submodules resolvable
        mod.__spec__ = importlib.util.spec_from_loader(
            name, loader=None, is_package=True
        )

        def _getattr(k, _m=mod):
            # never answer dunder probes (inspect/torch.library walk
            # modules and stat their __file__)
            if k.startswith("__"):
                raise AttributeError(k)
            return _AnyAttr()

        mod.__getattr__ = _getattr
        sys.modules.setdefault(name, mod)
        return mod

    tvt2 = _stub_module("torchvision.transforms.v2")
    tvt2.Compose = Compose
    tvt2.functional = _stub_module("torchvision.transforms.v2.functional")
    tvt.v2 = tvt2
    tvt.functional = _stub_module("torchvision.transforms.functional")
    tv.transforms = tvt
    tv.ops = _stub_module("torchvision.ops")
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tvt)

    # kornia: geocalib's utils import it; the network forwards under test
    # don't call into it
    kor = types.ModuleType("kornia")
    kor.__path__ = []
    kor.__spec__ = importlib.util.spec_from_loader(
        "kornia", loader=None, is_package=True
    )
    for sub in ("filters", "geometry", "color", "morphology", "utils"):
        m = _stub_module(f"kornia.{sub}")
        setattr(kor, sub, m)
    sys.modules.setdefault("kornia", kor)

    # timm: the reference's swin/fuse modules import DropPath / to_2tuple /
    # trunc_normal_ — give REAL minimal implementations (DropPath must be a
    # working nn.Module: it's instantiated inside model constructors)
    import torch as _torch

    class _DropPath(_torch.nn.Module):
        def __init__(self, drop_prob=0.0, *a, **kw):
            super().__init__()
            self.drop_prob = drop_prob or 0.0

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = x.new_empty(shape).bernoulli_(keep)
            return x * mask / keep

    def _to_2tuple(v):
        return v if isinstance(v, tuple) else (v, v)

    timm = types.ModuleType("timm")
    timm.__path__ = []
    timm.__spec__ = importlib.util.spec_from_loader(
        "timm", loader=None, is_package=True
    )
    tl = _stub_module("timm.layers")
    tl.DropPath = _DropPath
    tl.to_2tuple = _to_2tuple
    tl.trunc_normal_ = _torch.nn.init.trunc_normal_
    tml = _stub_module("timm.models")
    tmll = _stub_module("timm.models.layers")
    tmll.DropPath = _DropPath
    tmll.to_2tuple = _to_2tuple
    tmll.trunc_normal_ = _torch.nn.init.trunc_normal_
    tmr = _stub_module("timm.models.registry")
    tmr.register_model = lambda fn: fn
    tml.layers, tml.registry = tmll, tmr
    timm.layers, timm.models = tl, tml
    sys.modules.setdefault("timm", timm)

    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    _installed = True


def ref_module(name: str):
    """Import a module from the reference tree (with stubs installed);
    pytest-skip if the tree or an unstubbable dependency is absent."""
    if not os.path.isdir(REF_ROOT):
        pytest.skip(f"reference tree not available at {REF_ROOT}")
    _install_stubs()
    try:
        return importlib.import_module(name)
    except Exception as e:  # noqa: BLE001 — env-dependent, skip not fail
        pytest.skip(f"reference module {name} not importable here: {e!r}")


def ref_config(relpath: str):
    """Load a reference config .py file (filenames contain dots, so they
    are not importable by module name) and return its ``config`` object."""
    if not os.path.isdir(REF_ROOT):
        pytest.skip(f"reference tree not available at {REF_ROOT}")
    _install_stubs()
    path = os.path.join(REF_ROOT, relpath)
    spec = importlib.util.spec_from_file_location("_ref_cfg", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.config
