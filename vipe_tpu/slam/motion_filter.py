"""Keyframe motion filter (reference
/root/reference/vipe/slam/components/motion_filter.py:25-150).

Runs the feature encoder on EVERY frame, then one ConvGRU update against the
last keyframe's features; the mean masked flow-delta magnitude gates keyframe
creation (threshold ``filter_thresh`` = 2.4, configs/slam/default.yaml:5).

TPU-specific design: the score is *submitted* asynchronously and *resolved* a
frame later, so the ~25 ms device→host readback of the decision scalar
overlaps the next frame's upload + compute instead of serializing the loop.
Semantics stay exact: a token whose keyframe reference went stale (the
previous frame became a keyframe after submission) is recomputed on resolve.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..ops import corr as corr_ops


@functools.lru_cache(maxsize=None)
def _jitted_score(update_fn, masked: bool):
    """One fused program per update_fn: corr volume+pyramid+lookup + one GRU
    iteration + masked mean — eager execution of the all-pairs einsum lowers
    to a pathologically slow kernel on TPU (~8 s/frame); jitted it's ~ms.

    Inputs carry a leading V (views) axis; the returned score is the MIN of
    the per-view mean flow deltas (reference motion_filter.py:105-110 —
    min adds the fewest keyframes)."""

    def score(params, f_fmap, f_net, f_inp, f_mask, fmap):
        V, ht, wd = fmap.shape[0], fmap.shape[1], fmap.shape[2]
        u, v = jnp.meshgrid(
            jnp.arange(wd, dtype=jnp.float32),
            jnp.arange(ht, dtype=jnp.float32),
            indexing="xy",
        )
        coords0 = jnp.broadcast_to(
            jnp.stack([u, v], axis=-1)[None], (V, ht, wd, 2)
        )
        pyr = corr_ops.corr_pyramid(
            f_fmap.astype(jnp.float32), fmap.astype(jnp.float32)
        )
        corr = corr_ops.corr_lookup_pyramid(pyr, coords0)
        motn = jnp.zeros((V, ht, wd, 4), jnp.float32)
        _, delta, _, _ = update_fn(
            params, f_net, f_inp, corr, motn,
            jnp.zeros((V,), jnp.int32), jnp.zeros((V,), jnp.int32), 1,
        )
        flow_mag = jnp.linalg.norm(delta, axis=-1)  # (V, ht, wd)
        if masked:
            w = (~f_mask).astype(jnp.float32)
            per_view = jnp.mean(flow_mag * w, axis=(1, 2)) / (
                jnp.mean(w, axis=(1, 2)) + 1e-6
            )
        else:
            per_view = jnp.mean(flow_mag, axis=(1, 2))
        return jnp.min(per_view)

    if masked:
        return jax.jit(score)
    return jax.jit(lambda params, f_fmap, f_net, f_inp, fmap: score(
        params, f_fmap, f_net, f_inp, None, fmap))


@functools.lru_cache(maxsize=None)
def _jitted_score_vec(update_fn, masked: bool):
    """Batched variant of :func:`_jitted_score`: scores a (B, ht, wd, 128)
    block of frame features against ONE shared keyframe reference in a
    single dispatch, returning per-frame scores (B,).

    The B frames ride the update net's edge axis; only ``delta`` (a per-edge
    output) feeds the score, so rows can't mix through GraphAgg's
    per-source aggregation.  Used by the pass-1 upload/encode batching:
    one stacked upload + one encode + one score dispatch + one vector
    readback per ``upload_batch`` frames (VERDICT r03 item 8)."""

    def score(params, f_fmap, f_net, f_inp, f_mask, fmaps):
        B, ht, wd = fmaps.shape[0], fmaps.shape[1], fmaps.shape[2]
        u, v = jnp.meshgrid(
            jnp.arange(wd, dtype=jnp.float32),
            jnp.arange(ht, dtype=jnp.float32),
            indexing="xy",
        )
        coords0 = jnp.broadcast_to(
            jnp.stack([u, v], axis=-1)[None], (B, ht, wd, 2)
        )
        f_b = jnp.broadcast_to(f_fmap, (B,) + f_fmap.shape[1:])
        pyr = corr_ops.corr_pyramid(
            f_b.astype(jnp.float32), fmaps.astype(jnp.float32)
        )
        corr = corr_ops.corr_lookup_pyramid(pyr, coords0)
        motn = jnp.zeros((B, ht, wd, 4), jnp.float32)
        net_b = jnp.broadcast_to(f_net, (B,) + f_net.shape[1:])
        inp_b = jnp.broadcast_to(f_inp, (B,) + f_inp.shape[1:])
        _, delta, _, _ = update_fn(
            params, net_b, inp_b, corr, motn,
            jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32), 1,
        )
        flow_mag = jnp.linalg.norm(delta, axis=-1)  # (B, ht, wd)
        if masked:
            w = jnp.broadcast_to(
                (~f_mask).astype(jnp.float32), (B, ht, wd)
            )
            return jnp.mean(flow_mag * w, axis=(1, 2)) / (
                jnp.mean(w, axis=(1, 2)) + 1e-6
            )
        return jnp.mean(flow_mag, axis=(1, 2))

    if masked:
        return jax.jit(score)
    return jax.jit(lambda params, f_fmap, f_net, f_inp, fmaps: score(
        params, f_fmap, f_net, f_inp, None, fmaps))


class _SharedScores:
    """One device (B,) score vector shared by B tokens; the host fetch
    happens ONCE, on the first row read (the async copy was started at
    submit, so by resolve time it has usually landed)."""

    __slots__ = ("vec", "_host")

    def __init__(self, vec):
        self.vec = vec
        self._host = None

    def row(self, i) -> float:
        if self._host is None:
            import numpy as np

            self._host = np.asarray(self.vec)
        return float(self._host[i])


class _RowScore:
    """float()-able view of one row of a :class:`_SharedScores` vector."""

    __slots__ = ("shared", "i")

    def __init__(self, shared: _SharedScores, i: int):
        self.shared = shared
        self.i = i

    def __float__(self) -> float:
        return self.shared.row(self.i)

    def copy_to_host_async(self):
        try:
            self.shared.vec.copy_to_host_async()
        except Exception:
            pass


@dataclasses.dataclass
class _Token:
    image: object           # device image handle
    fmap: object            # (h, w, 128) device
    score: object           # () device scalar, or None for the init frame
    mask: object
    kf_version: int
    frame_idx: int = 0


class MotionFilter:
    def __init__(self, encode_features_fn: Callable, encode_context_fn: Callable,
                 update_fn: Callable, params, thresh: float,
                 sparse_tracks=None):
        """``encode_*_fn(params, images_nhwc)``; ``update_fn`` as in
        FactorGraph; ``sparse_tracks``: optional SparseTracks whose
        keypoint flow adds to the keyframe decision (reference
        motion_filter.py:112-141)."""
        self.encode_features = encode_features_fn
        self.encode_context = encode_context_fn
        self.update_fn = update_fn
        self.params = params
        self.thresh = thresh
        self.sparse_tracks = sparse_tracks
        self.current_frame_idx = -1
        self.last_kf_frame_idx = 0
        self.last_n_sparse_tracks = 0
        self.initialized = False
        self.kf_version = 0
        self.f_fmap = None
        self.f_net = None
        self.f_inp = None
        self.f_mask = None

    # ------------------------------------------------------------- internals

    def _score(self, fmap):
        """One GRU iteration against the stored keyframe → flow-mag score.

        update_fns marked ``host_only`` (e.g. the test oracle, which closes
        over host state) take an eager path; real networks run fused."""
        if getattr(self.update_fn, "host_only", False):
            return self._score_eager(fmap)
        if self.f_mask is not None:
            fn = _jitted_score(self.update_fn, True)
            return fn(self.params, self.f_fmap, self.f_net, self.f_inp,
                      self.f_mask, fmap)
        fn = _jitted_score(self.update_fn, False)
        return fn(self.params, self.f_fmap, self.f_net, self.f_inp, fmap)

    def _score_eager(self, fmap):
        V, ht, wd = fmap.shape[0], fmap.shape[1], fmap.shape[2]
        u, v = jnp.meshgrid(
            jnp.arange(wd, dtype=jnp.float32),
            jnp.arange(ht, dtype=jnp.float32),
            indexing="xy",
        )
        coords0 = jnp.broadcast_to(
            jnp.stack([u, v], axis=-1)[None], (V, ht, wd, 2)
        )
        pyr = corr_ops.corr_pyramid(
            self.f_fmap.astype(jnp.float32), fmap.astype(jnp.float32)
        )
        corr = corr_ops.corr_lookup_pyramid(pyr, coords0)
        motn = jnp.zeros((V, ht, wd, 4), jnp.float32)
        _, delta, _, _ = self.update_fn(
            self.params, self.f_net, self.f_inp, corr, motn,
            jnp.zeros((V,), jnp.int32), jnp.zeros((V,), jnp.int32), 1,
        )
        flow_mag = jnp.linalg.norm(delta, axis=-1)
        if self.f_mask is not None:
            w = (~self.f_mask).astype(jnp.float32)
            per_view = jnp.mean(flow_mag * w, axis=(1, 2)) / (
                jnp.mean(w, axis=(1, 2)) + 1e-6
            )
        else:
            per_view = jnp.mean(flow_mag, axis=(1, 2))
        return jnp.min(per_view)

    def _promote(self, token: _Token):
        """Make the token's frame the new keyframe reference."""
        net, inp = self.encode_context(self.params, token.image)
        self.f_fmap = token.fmap
        self.f_net, self.f_inp = net, inp
        self.f_mask = token.mask
        self.kf_version += 1

    # ------------------------------------------------------------------- API

    @property
    def _decision_fixed(self):
        """True/False when the threshold makes every decision constant
        (±inf / negative): skip the score compute AND its ~25 ms readback."""
        if self.thresh == float("inf"):
            return False
        if self.thresh < 0 or self.thresh == float("-inf"):
            return True
        return None

    def submit(self, image, buffer_mask=None) -> _Token:
        """Enqueue the score computation for one frame (non-blocking).

        ``image``: (h, w, 3) single view or (V, h, w, 3) rig stack;
        ``buffer_mask``: matching (ht, wd) / (V, ht, wd)."""
        if image.ndim == 3:
            image = image[None]
            if buffer_mask is not None:
                buffer_mask = buffer_mask[None]
        fmap = self.encode_features(self.params, image)
        self.current_frame_idx += 1
        fi = self.current_frame_idx
        if not self.initialized:
            self.initialized = True
            tok = _Token(image, fmap, None, buffer_mask, self.kf_version, fi)
            # the first frame is always a keyframe: promote NOW so the next
            # submit (which may precede our resolve in the pipeline) has a
            # reference to score against
            self._promote(tok)
            return tok
        if self._decision_fixed is not None:
            return _Token(image, fmap, "fixed", buffer_mask,
                          self.kf_version, fi)
        score = self._score(fmap)
        try:
            # start the device→host transfer now; resolve() a frame later
            # then doesn't pay the tunnel round-trip
            score.copy_to_host_async()
        except Exception:
            pass
        return _Token(image, fmap, score, buffer_mask, self.kf_version, fi)

    def submit_group(self, images, buffer_masks=None, n_valid=None):
        """Batched :meth:`submit` for ``n_valid`` single-view frames stacked
        as ``images`` (B, h, w, 3) (rows past n_valid are shape padding).

        Returns ``(tokens, fmaps)``: one token per valid frame plus the
        (B, ht, wd, 128) feature block (callers park rows from it).  All
        scores ride ONE fused dispatch against the CURRENT keyframe
        reference and ONE async vector readback; a token whose reference
        goes stale before resolve is re-scored exactly like single submits
        (refresh / resolve recompute paths are shared).

        Pass-1 batching (VERDICT r03 item 8): per ``upload_batch`` frames
        this turns B uploads + B encode dispatches + B scalar readbacks
        into 1 + 1 + 1."""
        B = images.shape[0]
        n_valid = B if n_valid is None else int(n_valid)
        if getattr(self.update_fn, "host_only", False):
            toks = [
                self.submit(
                    images[i],
                    None if buffer_masks is None else buffer_masks[i],
                )
                for i in range(n_valid)
            ]
            return toks, None
        fmaps = self.encode_features(self.params, images)

        def _mask(i):
            if buffer_masks is None:
                return None
            m = buffer_masks[i]
            return None if m is None else (m if m.ndim == 3 else m[None])

        tokens = []
        start = 0
        if not self.initialized:
            self.initialized = True
            self.current_frame_idx += 1
            tok = _Token(images[0:1], fmaps[0:1], None, _mask(0),
                         self.kf_version, self.current_frame_idx)
            self._promote(tok)
            tokens.append(tok)
            start = 1
        if start >= n_valid:
            return tokens, fmaps
        if self._decision_fixed is not None:
            for i in range(start, n_valid):
                self.current_frame_idx += 1
                tokens.append(_Token(images[i: i + 1], fmaps[i: i + 1],
                                     "fixed", _mask(i), self.kf_version,
                                     self.current_frame_idx))
            return tokens, fmaps
        if self.f_mask is not None:
            fn = _jitted_score_vec(self.update_fn, True)
            vec = fn(self.params, self.f_fmap, self.f_net, self.f_inp,
                     self.f_mask, fmaps)
        else:
            fn = _jitted_score_vec(self.update_fn, False)
            vec = fn(self.params, self.f_fmap, self.f_net, self.f_inp, fmaps)
        shared = _SharedScores(vec)
        try:
            vec.copy_to_host_async()
        except Exception:
            pass
        for i in range(start, n_valid):
            self.current_frame_idx += 1
            tokens.append(_Token(images[i: i + 1], fmaps[i: i + 1],
                                 _RowScore(shared, i), _mask(i),
                                 self.kf_version, self.current_frame_idx))
        return tokens, fmaps

    def _sparse_score(self, frame_idx: int) -> float:
        """Mean keypoint flow vs the last keyframe, plus the track-attrition
        forcing bump (reference motion_filter.py:112-136: force a keyframe
        when >20% of the tracks vanished)."""
        st = self.sparse_tracks
        if st is None or not st.enabled:
            return 0.0
        score = 0.0
        n_tracks = 0
        import numpy as np

        for v in range(st.n_views):
            kp = st.get_correspondences(v, frame_idx, self.last_kf_frame_idx)
            n_tracks += len(kp)
            if kp:
                cur = st.get_observations(v, frame_idx, kp)
                last = st.get_observations(v, self.last_kf_frame_idx, kp)
                score += float(
                    np.linalg.norm(cur - last, axis=-1).mean()
                )
        diff = n_tracks - self.last_n_sparse_tracks
        if diff < 0 and self.last_n_sparse_tracks > 0:
            if -diff / self.last_n_sparse_tracks > 0.2:
                score += 100.0
        self.last_n_sparse_tracks = n_tracks
        return score

    def _promote_kf(self, token: _Token):
        self._promote(token)
        self.last_kf_frame_idx = token.frame_idx
        self.last_n_sparse_tracks = 0

    def refresh(self, token: _Token) -> None:
        """Re-score a submitted token whose keyframe reference went stale
        (the frame before it was promoted after this token's submit).

        Without this, resolve() recomputes the score synchronously — a full
        dispatch + blocking readback for every first frame after a keyframe
        (~1 in 3 frames at typical cadence).  Calling refresh right after the
        promoting resolve turns that into an async dispatch whose readback
        overlaps the next frame's decode + upload.  No-op when the token is
        current; the recomputed score is bit-identical to what resolve()
        would have produced."""
        if token.score is None or isinstance(token.score, str):
            return
        if token.kf_version == self.kf_version:
            return
        token.score = self._score(token.fmap)
        token.kf_version = self.kf_version
        try:
            token.score.copy_to_host_async()
        except Exception:
            pass

    def resolve(self, token: _Token) -> bool:
        """Blockingly decide whether the submitted frame is a keyframe."""
        if token.score is None:  # first frame, already promoted at submit
            self.last_kf_frame_idx = token.frame_idx
            return True
        fixed = self._decision_fixed
        if fixed is not None:
            if fixed:
                self._promote_kf(token)
            return fixed
        if token.kf_version != self.kf_version:
            # keyframe reference changed after submission → recompute
            token.score = self._score(token.fmap)
            token.kf_version = self.kf_version
        sparse = self._sparse_score(token.frame_idx)
        if float(token.score) > self.thresh or sparse > self.thresh * 2:
            self._promote_kf(token)
            return True
        return False

    def check(self, image, buffer_mask=None) -> bool:
        """Synchronous submit+resolve (reference-equivalent API)."""
        return self.resolve(self.submit(image, buffer_mask))

    @property
    def last_keyframe_features(self):
        """(fmap, net, inp) of the current keyframe reference — V axis
        stripped for single-view streams."""
        if self.f_fmap.shape[0] == 1:
            return self.f_fmap[0], self.f_net[0], self.f_inp[0]
        return self.f_fmap, self.f_net, self.f_inp
