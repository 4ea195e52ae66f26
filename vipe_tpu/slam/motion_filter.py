"""Keyframe motion filter (reference
/root/reference/vipe/slam/components/motion_filter.py:25-150).

Runs the feature encoder on EVERY frame, then one ConvGRU update against the
last keyframe's features; the mean masked flow-delta magnitude gates keyframe
creation (threshold ``filter_thresh`` = 2.4, configs/slam/default.yaml:5).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

from ..ops import corr as corr_ops


class MotionFilter:
    def __init__(self, encode_features_fn: Callable, encode_context_fn: Callable,
                 update_fn: Callable, params, thresh: float):
        """``encode_*_fn(params, images_nhwc)``; ``update_fn`` as in FactorGraph."""
        self.encode_features = encode_features_fn
        self.encode_context = encode_context_fn
        self.update_fn = update_fn
        self.params = params
        self.thresh = thresh
        self.initialized = False
        self.f_fmap = None
        self.f_net = None
        self.f_inp = None
        self.f_mask = None
        self.count = 0  # frames skipped since last keyframe (reference :143)

    def check(self, image, buffer_mask=None) -> bool:
        """image: (H, W, 3) RGB in [0, 1]; buffer_mask: (h, w) bool 1=invalid.

        Returns True iff this frame becomes a keyframe.
        """
        fmap = self.encode_features(self.params, image[None])[0]

        if not self.initialized:
            net, inp = self.encode_context(self.params, image[None])
            self.f_fmap, self.f_net, self.f_inp = fmap, net[0], inp[0]
            self.f_mask = buffer_mask
            self.initialized = True
            return True

        ht, wd = fmap.shape[0], fmap.shape[1]
        u, v = jnp.meshgrid(
            jnp.arange(wd, dtype=jnp.float32),
            jnp.arange(ht, dtype=jnp.float32),
            indexing="xy",
        )
        coords0 = jnp.stack([u, v], axis=-1)[None]

        pyr = corr_ops.corr_pyramid(
            self.f_fmap[None].astype(jnp.float32),
            fmap[None].astype(jnp.float32),
        )
        corr = corr_ops.corr_lookup_pyramid(pyr, coords0)
        motn = jnp.zeros((1, ht, wd, 4), jnp.float32)
        _, delta, _, _ = self.update_fn(
            self.params, self.f_net[None], self.f_inp[None], corr, motn,
            jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32), 1,
        )
        flow_mag = jnp.linalg.norm(delta[0], axis=-1)
        if self.f_mask is not None:
            wgt = (~self.f_mask).astype(jnp.float32)
            score = float(jnp.mean(flow_mag * wgt) / (jnp.mean(wgt) + 1e-6))
        else:
            score = float(jnp.mean(flow_mag))

        if score > self.thresh:
            net, inp = self.encode_context(self.params, image[None])
            self.f_fmap, self.f_net, self.f_inp = fmap, net[0], inp[0]
            self.f_mask = buffer_mask
            return True
        return False
