"""GeoCalib: single-image camera calibration (reference
/root/reference/vipe/priors/geocalib/).

Pipeline: MSCAN backbone + LightHamHead decoders predict an up-vector field,
a latitude field and per-pixel confidences; a differentiable LM optimizer
recovers (gravity, focal[, k1]) from them (extractor.py:80-135).

Ported so far: the perspective fields and the fully-jitted LM optimizer
(the mathematically load-bearing half).  The MSCAN/LightHam network port is
pending — ``GeoCalib`` raises until it lands, and the pipeline's intrinsics
init falls back to the FOV heuristic (pipeline/processors.py).
"""

from __future__ import annotations

import numpy as np

from .fields import gravity_from_rp, latitude_field, rp_from_gravity, up_field  # noqa: F401
from .optimizer import calibrate_from_fields, lm_calibrate  # noqa: F401


class GeoCalib:
    """Extractor API matching the reference (extractor.py:20-135)."""

    def __init__(self, camera_type: str = "pinhole"):
        raise NotImplementedError(
            "GeoCalib's MSCAN+LightHamHead network is not ported yet; the "
            "perspective-field LM optimizer is available as "
            "vipe_tpu.priors.geocalib.calibrate_from_fields. Use "
            "init.intrinsics=fov (heuristic) or =gt meanwhile."
        )
