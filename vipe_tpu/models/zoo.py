"""Model-zoo weight registry: local checkpoint resolution + conversion.

The reference auto-downloads every prior's pretrained checkpoint on first
use (SURVEY §5 "Checkpoint/resume": gdown / HF hub / GitHub releases).  The
TPU rebuild resolves weights from a LOCAL directory instead — point
``VIPE_WEIGHTS_DIR`` (default ``~/.cache/vipe_weights``) at a directory
holding, per model family, either

* ``<family>.npz`` — a pre-converted flax pytree (keys '/'-joined), or
* ``<family>.pth`` / ``.pt`` / ``.ckpt`` / ``.bin`` — the reference's torch
  checkpoint; converted on first load via the torch→flax converters
  (models/convert.py and friends) and cached as ``<family>.npz`` alongside.

Family names: ``droidnet``, ``dav2_vits|vitb|vitl``, ``vda_vits|vitl``,
``metric3d_small|large``, ``unidepth_s|b|l``, ``geocalib_pinhole|distorted``,
``sam_vit_b|vit_l|vit_h``, ``gdino``, ``deaot``, ``priorda``,
``priorda_fine``.

Absent weights → ``load_params`` returns None and models run random-init
(the converters themselves are pinned by the torch-oracle activation-parity
suite, tests/test_ref_activation_parity.py).
"""

from __future__ import annotations

import os
import pathlib
from typing import Mapping, Optional

import numpy as np

_EXTS = (".npz", ".pth", ".pt", ".ckpt", ".bin")


def weights_dir() -> pathlib.Path:
    return pathlib.Path(
        os.environ.get(
            "VIPE_WEIGHTS_DIR", os.path.expanduser("~/.cache/vipe_weights")
        )
    )


def _find(family: str) -> Optional[pathlib.Path]:
    d = weights_dir()
    for ext in _EXTS:
        p = d / f"{family}{ext}"
        if p.is_file():
            return p
    return None


def has_weights(family: str) -> bool:
    return _find(family) is not None


def flatten_tree(tree, prefix: str = "") -> dict:
    """Nested param dict → {'a/b/c': ndarray} (npz-compatible keys)."""
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, Mapping):
            out.update(flatten_tree(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def unflatten_tree(flat: Mapping) -> dict:
    out: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


def _torch_state_dict(path: pathlib.Path) -> dict:
    import torch

    obj = torch.load(str(path), map_location="cpu", weights_only=False)
    for key in ("state_dict", "model", "model_state_dict", "module"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
    sd = {}
    for k, v in obj.items():
        if hasattr(v, "numpy"):
            sd[k.removeprefix("module.")] = v.detach().cpu().numpy()
    return sd


def _convert(family: str, sd: Mapping) -> dict:
    from . import convert as C

    base = family.split("_")[0]
    if base == "droidnet":
        return C.convert_droidnet(sd)
    if base == "dav2":
        return C.convert_dav2(sd)
    if base == "priorda":
        # both stages are DAv2 graphs; the fine stage additionally carries
        # the zero-init alpha_proj condition projection (convert_dav2
        # passes it through when present)
        return C.convert_dav2(sd)
    if base == "vda":
        return C.convert_vda(sd)
    if base == "metric3d":
        return C.convert_metric3d(sd)
    if base == "unidepth":
        return C.convert_unidepth(sd)
    if base == "geocalib":
        return C.convert_geocalib(sd)
    if base == "sam":
        return C.convert_sam(sd)
    if base == "gdino":
        from ..priors.track_anything.gdino import GDINOConfig
        from ..priors.track_anything.gdino.convert import convert_gdino

        return convert_gdino(sd, GDINOConfig())
    if base == "deaot":
        from ..priors.track_anything.deaot import DeAOTConfig
        from ..priors.track_anything.deaot.convert import convert_deaot

        return convert_deaot(sd, DeAOTConfig())
    raise ValueError(f"unknown weight family {family!r}")


def load_params(family: str) -> Optional[dict]:
    """Converted flax params for ``family``, or None when no checkpoint is
    present.  Torch checkpoints are converted once and cached as .npz."""
    path = _find(family)
    if path is None:
        return None
    if path.suffix == ".npz":
        with np.load(path) as z:
            return unflatten_tree({k: z[k] for k in z.files})
    params = _convert(family, _torch_state_dict(path))
    cache = path.with_suffix(".npz")
    try:
        np.savez(cache, **flatten_tree(params))
    except OSError:
        pass
    return params
