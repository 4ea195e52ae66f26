"""GeoCalib: single-image camera calibration (reference
/root/reference/vipe/priors/geocalib/).

Pipeline: MSCAN backbone + LightHamHead decoders predict an up-vector field,
a latitude field and per-pixel confidences; a fully-jitted LM optimizer
recovers (gravity, focal) from them (extractor.py:80-135).  Checkpoints come
from the GeoCalib GitHub release in the reference (extractor.py:33-40); in
this environment the net runs with random init, so accuracy requires weights
— the pipeline keeps the FOV-heuristic default until they are supplied.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from .fields import gravity_from_rp, latitude_field, rp_from_gravity, up_field  # noqa: F401
from .optimizer import calibrate_from_fields, lm_calibrate  # noqa: F401


class GeoCalib:
    """Extractor API matching the reference (extractor.py:20-135):
    ``calibrate(frames) -> intrinsics`` with shared focal across samples."""

    def __init__(self, camera_type: str = "pinhole", params=None,
                 rng_seed: int = 0, infer_size: int = 320):
        import jax
        import jax.numpy as jnp

        from .network import GeoCalibNet

        assert camera_type in (
            "pinhole", "simple_radial", "simple_divisional", "simple_mei",
        ), camera_type
        self.camera_type = camera_type
        self.net = GeoCalibNet()
        self.infer_size = infer_size
        if params is None:
            from ...models import zoo

            # reference ships two checkpoint flavors (extractor.py:33-40)
            flavor = "pinhole" if camera_type == "pinhole" else "distorted"
            params = zoo.load_params(f"geocalib_{flavor}")
        if params is None:
            params = self.net.init(
                jax.random.PRNGKey(rng_seed),
                jnp.zeros((1, infer_size, infer_size, 3)),
            )
        self.params = params
        self._forward = jax.jit(lambda p, x: self.net.apply(p, x))

    def _preprocess(self, rgb: np.ndarray) -> np.ndarray:
        """Aspect-preserving short-side resize to ``infer_size``, center-crop
        to /32 multiples (reference ImagePreprocessor: resize 320 short side,
        edge_divisible_by 32 — extractor.py:50, utils.py:74-130).  The round-1
        square squash biased up/latitude fields for non-square video."""
        import cv2

        h0, w0 = rgb.shape[:2]
        s = self.infer_size / min(h0, w0)
        h1, w1 = int(round(h0 * s)), int(round(w0 * s))
        img = cv2.resize(np.asarray(rgb, np.float32), (w1, h1))
        hc, wc = (h1 // 32) * 32, (w1 // 32) * 32
        t, l = (h1 - hc) // 2, (w1 - wc) // 2
        return img[t: t + hc, l: l + wc]

    def predict_fields(self, rgb: np.ndarray):
        """(H, W, 3) float [0,1] → dict of up/latitude fields + confidences."""
        import jax.numpy as jnp

        img = self._preprocess(rgb)
        out = self._forward(self.params, jnp.asarray(img)[None])
        return {k: np.asarray(v[0]) for k, v in out.items()}

    def calibrate(self, frames: List[np.ndarray], shared_intrinsics: bool = True):
        """Calibrate from ≤3 sampled frames (reference processors.py:83-104).

        Returns full-res intrinsics: pinhole → (4,) [fx, fy, cx, cy];
        distorted models → (5,) with the recovered k1 appended (the
        normalized-coordinate distortion is resolution independent).
        """
        fields = [self.predict_fields(f) for f in frames]
        ups = np.stack([f["up_field"] for f in fields])
        lats = np.stack([f["latitude_field"] for f in fields])
        ucs = np.stack([f["up_confidence"] for f in fields])
        lcs = np.stack([f["latitude_confidence"] for f in fields])
        res = calibrate_from_fields(ups, lats, ucs, lcs,
                                    model=self.camera_type)

        h0, w0 = frames[0].shape[:2]
        # focal recovered at the (uniformly scaled) infer resolution; undo the
        # short-side scale factor (the /32 crop does not change focal)
        f_full = float(res.focal) * (min(h0, w0) / self.infer_size)
        intr = [f_full, f_full, w0 / 2.0, h0 / 2.0]
        if self.camera_type != "pinhole":
            intr.append(float(res.k1))
        return np.asarray(intr, np.float32)
