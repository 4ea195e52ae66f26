"""GraphBuffer: the SLAM state-of-the-world as fixed-shape device arrays.

TPU-native counterpart of the reference ``GraphBuffer``
(/root/reference/vipe/slam/components/buffer.py:49-370).  Same preallocated
ring-buffer design (``buffer_size`` slots, ``configs/slam/default.yaml:1``),
but arrays are jnp NHWC and all mutation happens through functional
``.at[].set`` so every consumer stays jit-friendly.  Topology bookkeeping
(n_frames, timestamps) is host-side numpy, exactly where the reference keeps
its Python ints.

Multi-view rig (``n_views`` > 1): per-view arrays are flattened as slot =
frame·V + view (the reference's ``flattened_disps``/``di`` layout,
buffer.py:174-176, 303-361); ``rig`` holds per-view SE3 offsets and
``cross_view_idx`` the per-(frame,view) cross-view edge targets.  For V = 1
every slot equals its frame index and the single-view paths are unchanged.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import cameras as cam
from ..ops import geom, lie
from ..utils import jaxutil


def bucket_size(n: int, minimum: int = 16) -> int:
    """Round up to the next power of two (bounds jit recompiles)."""
    b = minimum
    while b < n:
        b *= 2
    return b


@functools.partial(jax.jit, static_argnums=(6,))
def _jitted_frame_distance(poses, disps, intr, ii, jj, beta, bidirectional):
    """One dispatch for the keyframe-removal distance check — eagerly the
    ~40 primitives inside cost >1 s of tunnel round-trips per call."""
    d = geom.frame_distance(poses, disps, intr, ii, jj, di=ii, beta=beta)
    if bidirectional:
        d2 = geom.frame_distance(poses, disps, intr, jj, ii, di=jj, beta=beta)
        d = 0.5 * (d + d2)
    return d


@functools.partial(jax.jit, static_argnums=(7, 8))
def _jitted_frame_distance_mv(poses, rig, disps, intr, ii, jj, beta,
                              V, bidirectional):
    """Per-view same-view frame distances, (E·V,) EDGE-major (views
    contiguous per edge — reshape (E, V); reference
    frame_distance_dense_disp, buffer.py:550-593 with cross=False)."""
    E = ii.shape[0]
    pi = jnp.repeat(ii, V)
    pj = jnp.repeat(jj, V)
    qv = jnp.tile(jnp.arange(V, dtype=ii.dtype), E)
    d = geom.frame_distance_mv(
        poses, rig, disps, intr, pi, qv, pi * V + qv, pj, qv, beta=beta
    )
    if bidirectional:
        d2 = geom.frame_distance_mv(
            poses, rig, disps, intr, pj, qv, pj * V + qv, pi, qv, beta=beta
        )
        d = 0.5 * (d + d2)
    return d


@functools.partial(jax.jit, static_argnums=(3,))
def _jitted_reproject(poses, disps, intr_grid, camera_type, ii, jj):
    return geom.reproject(poses, disps, intr_grid, camera_type, ii, jj)


@jax.jit
def _depth_to_sens(depth):
    """Full-res metric depth → 1/8-grid disparity prior ([3::8, 3::8]
    sampling like the reference _add_keyframe, system.py:150-153)."""
    d = depth[..., 3::8, 3::8]
    return jnp.where(d > 0, 1.0 / jnp.maximum(d, 1e-8), d)


def _extract_geom_body(camera_type, poses, rig_v, disps, intr_grid, images):
    ht, wd = disps.shape[-2:]
    u, v = geom.pixel_grid(ht, wd)
    poses = jax.vmap(lambda p: lie.se3_mul(lie.se3_inv(rig_v), p))(poses)
    c2w = lie.se3_inv(poses)
    pts_local = cam.iproj_disp(
        camera_type, intr_grid,
        jnp.broadcast_to(u, disps.shape), jnp.broadcast_to(v, disps.shape),
        disps,
    )
    pts_world = geom.act_homog(c2w[:, None, None, :], pts_local)
    xyz = pts_world[..., :3] / jnp.maximum(pts_world[..., 3:], 1e-8)
    colors = images[:, 3::8, 3::8, :].astype(jnp.float32) / 255.0
    return xyz, colors


def _extract_filter_body(Nb, poses, rig_v, disps, pin, masks,
                         filter_thresh, n):
    ht, wd = disps.shape[-2:]
    poses = jax.vmap(lambda p: lie.se3_mul(lie.se3_inv(rig_v), p))(poses)
    valid_row = (jnp.arange(Nb) < n)[:, None, None]
    mean_disp = jnp.sum(jnp.where(valid_row, disps, 0.0)) / jnp.maximum(
        jnp.sum(valid_row) * ht * wd, 1
    )
    thresh_v = filter_thresh / jnp.maximum(mean_disp, 1e-8)
    counts = geom.depth_filter(
        poses, disps, pin, jnp.arange(Nb),
        jnp.broadcast_to(thresh_v, (Nb,)), num_valid=n,
    )
    per_frame_mean = jnp.mean(disps, axis=(1, 2), keepdims=True)
    return (
        (counts >= jnp.minimum(2, n - 1))
        & (disps > 0.5 * per_frame_mean)
        & (~masks)
    )


@functools.partial(jax.jit, static_argnums=(0, 1))
def _jitted_extract_map(camera_type, Nb, poses, rig_v, disps, intr_grid,
                        pin, masks, images, filter_thresh, n):
    """Whole map extraction as ONE program over a pow2 frame bucket — the
    eager chain (iproj + transform + depth_filter + masks) was ~40 tunnel
    dispatches.  Rows ≥ n are bucket padding, masked out by the caller."""
    xyz, colors = _extract_geom_body(
        camera_type, poses, rig_v, disps, intr_grid, images
    )
    mask = _extract_filter_body(
        Nb, poses, rig_v, disps, pin, masks, filter_thresh, n
    )
    return xyz, colors, mask


# The fully-fused panorama extract program faults the v5e TPU worker at
# runtime (async kernel fault; probe_pano.py bisected it to this program,
# probe_pano2.py proved each half compiles AND executes cleanly standalone
# — an XLA:TPU miscompile in the pano-iproj + depth_filter fusion).  For
# panoramas the extract therefore runs as TWO dispatches; it executes once
# per video, so the extra round trip is noise.
_jitted_extract_geom = functools.partial(jax.jit, static_argnums=(0,))(
    lambda camera_type, poses, rig_v, disps, intr_grid, images:
    _extract_geom_body(camera_type, poses, rig_v, disps, intr_grid, images)
)
_jitted_extract_filter = functools.partial(jax.jit, static_argnums=(0,))(
    lambda Nb, poses, rig_v, disps, pin, masks, filter_thresh, n:
    _extract_filter_body(Nb, poses, rig_v, disps, pin, masks,
                         filter_thresh, n)
)


class GraphBuffer:
    def __init__(
        self,
        height: int,
        width: int,
        buffer_size: int = 1024,
        init_disp: float = 1.0,
        camera_type: cam.CameraType = cam.CameraType.PINHOLE,
        dense_disp_alpha: float = 0.001,
        feat_dtype=jnp.bfloat16,
        n_views: int = 1,
        rig: Optional[np.ndarray] = None,
    ):
        assert height % 8 == 0 and width % 8 == 0
        self.height = height
        self.width = width
        self.ht = height // 8
        self.wd = width // 8
        self.camera_type = camera_type
        self.buffer_size = buffer_size
        self.init_disp = init_disp
        self.dense_disp_alpha = dense_disp_alpha
        self.n_views = n_views

        self.n_frames: int = 0
        self.tstamp = np.zeros(buffer_size, np.int64)

        V = n_views
        B, ht, wd = buffer_size, self.ht, self.wd
        BV = B * V  # per-view slots, frame-major (slot = frame·V + view)
        # images stored uint8 (604 MB at 1024×384×512 vs 2.4 GB f32); consumers
        # convert on device.  The reference stores fp16 (buffer.py:81-89).
        self.images = jnp.zeros((BV, height, width, 3), jnp.uint8)
        self.poses = jnp.broadcast_to(
            lie.se3_identity(), (B, 7)
        ).astype(jnp.float32)
        if camera_type == cam.CameraType.PANORAMA:
            # the equirect camera is fully determined by the frame size
            # (pixel-unit parameterization, ops/cameras.panorama_intrinsics);
            # the stream's all-zero panorama intrinsics are ignored
            base_intr = cam.panorama_intrinsics(height, width)
        else:
            base_intr = jnp.zeros(
                (camera_type.intrinsics_dim(),), jnp.float32
            )
        if V == 1:
            self.intrinsics = base_intr
        else:
            self.intrinsics = jnp.broadcast_to(
                base_intr, (V, camera_type.intrinsics_dim())
            )
        # rig c2w per view (reference buffer.py:101-103)
        if rig is None:
            self.rig = jnp.broadcast_to(
                lie.se3_identity(), (V, 7)
            ).astype(jnp.float32)
        else:
            self.rig = jnp.asarray(rig, jnp.float32).reshape(V, 7)
        # default cross-view target: same frame, next view (buffer.py:174-176)
        self.cross_view_idx = np.stack(
            [
                np.zeros((B, V), np.int64),
                (np.arange(V)[None, :] + 1) % V * np.ones((B, 1), np.int64),
            ],
            axis=-1,
        )
        self.cross_view_idx[..., 0] = np.arange(B)[:, None]
        self.disps = jnp.full((BV, ht, wd), init_disp, jnp.float32)
        self.disps_sens = jnp.zeros((BV, ht, wd), jnp.float32)
        self.masks = jnp.zeros((BV, ht, wd), bool)  # 1 = invalid (dynamic)
        self.fmaps = jnp.zeros((BV, ht, wd, 128), feat_dtype)
        self.nets = jnp.zeros((BV, ht, wd, 128), feat_dtype)
        self.inps = jnp.zeros((BV, ht, wd, 128), feat_dtype)
        # last intrinsics used for sens-depth estimation (buffer.py:176)
        self.last_depth_intrinsics: Optional[jnp.ndarray] = None

    # -------------------------------------------------------- multiview

    def expand_edge_multiview(self, ii, jj, cross: bool = True):
        """Frame edges → per-view expanded indices (pi, qi, di, pj, qj, dj)
        (reference buffer.py:303-361).  ii == jj edges become cross-view
        edges via ``cross_view_idx``.  Host numpy."""
        V = self.n_views
        ii = np.asarray(ii).reshape(-1, 1)
        jj = np.asarray(jj).reshape(-1, 1)
        qi = np.broadcast_to(np.arange(V), (len(ii), V)).copy()
        pi = np.broadcast_to(ii, (len(ii), V)).copy()
        qj = qi.copy()
        pj = np.broadcast_to(jj, (len(jj), V)).copy()
        if cross and V > 1:
            cm = (ii == jj)[:, 0]
            if cm.any():
                tv = self.cross_view_idx[pi[cm], qi[cm]]
                pj[cm] = tv[..., 0]
                qj[cm] = tv[..., 1]
        di = pi * V + qi
        dj = pj * V + qj
        return (pi.reshape(-1), qi.reshape(-1), di.reshape(-1),
                pj.reshape(-1), qj.reshape(-1), dj.reshape(-1))

    def build_adaptive_cross_view_idx(self, valid_thresh: float = 400.0):
        """Re-point cross-view edges at the (frame, view) pair with the
        smallest induced flow (reference buffer.py:270-301)."""
        V = self.n_views
        n = self.n_frames
        if V == 1 or n < 2:
            return
        intr = self.pinhole_grid_intrinsics
        ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        ii = ii.reshape(-1)
        jj = jj.reshape(-1)
        best_d = np.full((n, V), np.inf)
        best = np.zeros((n, V, 2), np.int64)
        for off in range(1, V):
            pi, qi, di, pj, qj, dj = self._expanded_with_offset(ii, jj, off)
            d = np.asarray(geom.frame_distance_mv(
                self.poses, self.rig, self.disps, intr,
                jnp.asarray(pi, jnp.int32), jnp.asarray(qi, jnp.int32),
                jnp.asarray(di, jnp.int32), jnp.asarray(pj, jnp.int32),
                jnp.asarray(qj, jnp.int32), beta=1.0,
            )).reshape(n, n, V)
            for s in range(n):
                for v in range(V):
                    k = int(np.argmin(d[s, :, v]))
                    if d[s, k, v] < best_d[s, v]:
                        best_d[s, v] = d[s, k, v]
                        best[s, v] = (k, (v + off) % V)
        upd = best_d < valid_thresh
        self.cross_view_idx[:n][upd] = best[upd]

    def _expanded_with_offset(self, ii, jj, view_offset):
        pi, qi, di, pj, qj, dj = self.expand_edge_multiview(ii, jj, cross=False)
        qj = (qj + view_offset) % self.n_views
        dj = pj * self.n_views + qj
        return pi, qi, di, pj, qj, dj

    # ------------------------------------------------------------------ state

    @property
    def scaled_intrinsics(self):
        """Intrinsics at the 1/8 SLAM grid."""
        return cam.scaled_intrinsics(self.camera_type, self.intrinsics, 1.0 / 8.0)

    @property
    def pinhole_grid_intrinsics(self):
        return cam.pinhole_equivalent(self.camera_type, self.intrinsics) / 8.0

    def append_keyframe(
        self,
        frame_idx: int,
        image,
        fmap,
        net,
        inp,
        mask=None,
        metric_depth=None,
        intrinsics=None,
        pose=None,
    ):
        """Fill the next buffer slot (reference SLAMSystem._add_keyframe,
        system.py:131-163).  ``metric_depth`` is full-res depth; sampled at
        [3::8, 3::8] and inverted into disps_sens.  All writes are donated
        (in-place on device) — an eager .at[].set would copy the whole
        multi-GB buffer per keyframe.

        For n_views > 1, ``image``/``fmap``/``net``/``inp``/``mask``/
        ``metric_depth`` carry a leading V axis; ``pose`` is per frame."""
        k = self.n_frames
        V = self.n_views
        assert k < self.buffer_size, "keyframe buffer exhausted"
        self.tstamp[k] = frame_idx
        img = jnp.asarray(image)
        if img.dtype != jnp.uint8:
            img = jnp.clip(img * 255.0, 0, 255).astype(jnp.uint8)

        def _v(x):
            x = jnp.asarray(x)
            return x[None] if V == 1 else x

        # ALL row writes ride ONE donated dispatch (each extra program over
        # the remote tunnel costs ~2-5 ms even fully pipelined)
        vals = {"images": _v(img), "fmaps": _v(fmap)}
        if net is not None:  # None: caller knows the row is never read
            vals["nets"] = _v(net)
        if inp is not None:
            vals["inps"] = _v(inp)
        if mask is not None:
            vals["masks"] = _v(mask)
        if metric_depth is not None:
            vals["disps_sens"] = _depth_to_sens(_v(metric_depth))
        arrs = {n: getattr(self, n) for n in vals}
        for n, a in jaxutil.set_rows_tree(arrs, vals, k * V).items():
            setattr(self, n, a)
        if (intrinsics is not None and k == 0
                and self.camera_type != cam.CameraType.PANORAMA):
            self.intrinsics = jnp.asarray(intrinsics, jnp.float32).reshape(
                self.intrinsics.shape
            )
        if pose is not None:
            self.poses = jaxutil.set_row(
                self.poses, k, jnp.asarray(pose, jnp.float32)
            )
        self.n_frames += 1

    def append_keyframe_copy(self, src_frame: int, frame_idx: int):
        """Append a slot as a device-side copy of an existing frame's rows.

        Pass 2 re-adds EVERY frame to the buffer (reference system.py:284-294
        runs ``_add_keyframe`` again); frames that were pass-1 keyframes
        already have their encoded features resident in slots < start_idx, so
        copying those rows replaces the re-upload + re-encode entirely.  Must
        write the same arrays ``append_keyframe`` writes: infill slots are
        REUSED across filler chunks (inner_filler sets ``n_frames`` back), so
        a skipped write would leak the previous chunk's rows."""
        k = self.n_frames
        V = self.n_views
        assert k < self.buffer_size, "keyframe buffer exhausted"
        assert src_frame < k
        self.tstamp[k] = frame_idx
        names = ("images", "fmaps", "nets", "inps", "masks", "disps_sens")
        arrs = jaxutil.copy_rows_tree(
            {n: getattr(self, n) for n in names}, src_frame * V, k * V, V
        )
        for n, a in arrs.items():
            setattr(self, n, a)
        self.n_frames += 1

    def append_keyframe_parked(self, park, row: int, frame_idx: int):
        """Append an infill slot whose ONLY live content is the feature
        map, copied device-side from the pass-1 parking store (see
        SLAMSystem pass 1).  Valid only on the fused-filler pass-2 path,
        where an infill row's other arrays (images/nets/inps/masks/disps/
        disps_sens) are never read — GRU/BA edge sources are always
        keyframe rows, and the SLAM map excludes infill slots."""
        k = self.n_frames
        assert k < self.buffer_size and self.n_views == 1
        self.tstamp[k] = frame_idx
        self.fmaps = jaxutil.copy_row_between(self.fmaps, park, row, k)
        self.n_frames += 1

    def remove_second_newest(self):
        """Shift slot n-1 into n-2 (reference buffer.py:218-232)."""
        self.remove_slot(self.n_frames - 2)

    def remove_slot(self, ix: int, top: int = None):
        """Remove keyframe row ``ix``, shifting rows (ix, top] down by one.

        ``top`` defaults to ``n_frames - 1`` (the reference's second-newest
        removal, buffer.py:218-232).  The speculative frontend passes a
        LARGER top: when the removal decision was deferred past the next
        keyframe's append, the initialized scratch row above ``n_frames``
        must shift down too.

        One donated dispatch for all slot arrays + one for poses: the old
        per-array form interleaved an EAGER ``arr[ix+1]`` gather with donated
        updates, which serializes the device pipeline (3× slower, measured —
        scripts/profile_dispatch.py 'rm-shaped').  The shift count is padded
        to a pow2 bucket (few compile keys); the extra shifted rows above
        ``top`` are garbage moving among garbage."""
        V = self.n_views
        top = self.n_frames - 1 if top is None else top
        n = top - ix
        assert n >= 1
        nb = min(bucket_size(n, minimum=1), self.buffer_size - ix - 1)
        assert V == 1 or n == 1, "late (speculative) removal is V=1 only"
        self.poses = jaxutil.copy_rows(self.poses, ix + 1, ix, nb)
        names = ("images", "disps", "disps_sens", "masks",
                 "fmaps", "nets", "inps")
        arrs = jaxutil.copy_rows_tree(
            {n_: getattr(self, n_) for n_ in names},
            (ix + 1) * V, ix * V, nb * V,
        )
        for name, a in arrs.items():
            setattr(self, name, a)
        if V > 1:
            self.cross_view_idx[ix] = self.cross_view_idx[ix + 1]
            # shift frame ids past the removed slot — ONLY for live rows;
            # unused default rows (r, next view) beyond n_frames must keep
            # pointing at themselves
            f = self.cross_view_idx[: self.n_frames, ..., 0]
            f[f >= ix + 1] -= 1
            # the vacated last slot reverts to its same-frame default
            last = self.n_frames - 1
            self.cross_view_idx[last, :, 0] = last
            self.cross_view_idx[last, :, 1] = (np.arange(V) + 1) % V
        self.tstamp[ix: top] = self.tstamp[ix + 1: top + 1]
        self.n_frames -= 1

    # --------------------------------------------------------------- geometry

    def reproject(self, ii, jj):
        """coords of frame-ii grids in frame jj (buffer.py:527-549)."""
        ii = jnp.asarray(ii, jnp.int32)
        jj = jnp.asarray(jj, jnp.int32)
        return _jitted_reproject(
            self.poses, self.disps, self.scaled_intrinsics, self.camera_type, ii, jj
        )

    def frame_distance(self, ii, jj, beta: float = 0.3, bidirectional: bool = True):
        """Mean induced flow distance (buffer.py:550-593): kernel call with
        (ii, jj, disp=ii), optionally averaged with (jj, ii, disp=jj).
        For a rig returns (E·V,) per-view distances (callers max/mean)."""
        ii = jnp.asarray(ii, jnp.int32)
        jj = jnp.asarray(jj, jnp.int32)
        intr = self.pinhole_grid_intrinsics
        if self.n_views > 1:
            return _jitted_frame_distance_mv(
                self.poses, self.rig, self.disps, intr, ii, jj,
                jnp.float32(beta), self.n_views, bidirectional,
            )
        return _jitted_frame_distance(
            self.poses, self.disps, intr, ii, jj, jnp.float32(beta),
            bidirectional,
        )

    def update_disps_sens(self, depth_model, frame_idx=None):
        """Re-estimate (or rescale) metric prior depth after intrinsics change
        (reference buffer.py:233-269).  METRIC_DEPTH models are focal-scalable
        without a rerun: disp_sens *= f_old / f_new."""
        if depth_model is None:
            return
        from ..priors.depth.base import DepthType

        if frame_idx is None:
            if self.last_depth_intrinsics is not None and bool(
                jnp.allclose(self.last_depth_intrinsics, self.intrinsics)
            ):
                return
            if (
                depth_model.depth_type == DepthType.METRIC_DEPTH
                and self.last_depth_intrinsics is not None
            ):
                ratio = float(self.last_depth_intrinsics[0]) / float(self.intrinsics[0])
                self.disps_sens = jaxutil.set_prefix(
                    self.disps_sens,
                    self.disps_sens[: self.n_frames] * ratio,
                )
                self.last_depth_intrinsics = self.intrinsics
                return
            frames = range(self.n_frames)
        else:
            frames = [frame_idx]

        from ..utils import profiling

        intr_row = (
            self.intrinsics[0] if self.intrinsics.ndim == 2
            else self.intrinsics
        )
        for k in frames:
            with profiling.stage("keyframe_depth"):
                if hasattr(depth_model, "estimate_sens_device"):
                    # one dispatch, zero host transfers: uint8 buffer image
                    # → policy resize → net → /8 disparity prior, focal
                    # read in-program from the live device intrinsics
                    sens = depth_model.estimate_sens_device(
                        self.images[k], intr_row
                    )
                else:
                    out = depth_model.estimate_depth(
                        self.images[k].astype(jnp.float32) / 255.0,
                        focal_length=float(self.intrinsics[0]),
                    )
                    d = jnp.asarray(out)[3::8, 3::8]
                    sens = jnp.where(d > 0, 1.0 / jnp.maximum(d, 1e-8), d)
            self.disps_sens = jaxutil.set_row(self.disps_sens, k, sens)
        self.last_depth_intrinsics = self.intrinsics

    # ---------------------------------------------------------------- mapping

    def extract_slam_map(self, filter_thresh: float, view: int = 0):
        """Filtered colored point cloud of the keyframe map
        (reference buffer.py:595-645 + depth_filter CUDA kernel).
        For a rig the map is built from ``view``'s slots with the rig offset
        composed into the per-frame poses."""
        from .interface import SLAMMap

        n = self.n_frames
        V = self.n_views
        Nb = min(bucket_size(n), self.buffer_size)
        if V > 1:
            # pad with frame 0's slot (harmless: rows ≥ n are masked out and
            # depth_filter ignores them via num_valid)
            fpad = np.minimum(np.arange(Nb), n - 1)
            slots = jnp.asarray(fpad * V + view, jnp.int32)
            poses = self.poses[jnp.asarray(fpad, jnp.int32)]
            disps = self.disps[slots]
            masks = self.masks[slots]
            images = self.images[slots]
            intr_v = self.intrinsics[view]
        else:
            poses = self.poses[:Nb]
            disps = self.disps[:Nb]
            masks = self.masks[:Nb]
            images = self.images[:Nb]
            intr_v = self.intrinsics
        intr_grid = cam.scaled_intrinsics(self.camera_type, intr_v, 1.0 / 8.0)
        pin = cam.pinhole_equivalent(self.camera_type, intr_v) / 8.0
        if self.camera_type == cam.CameraType.PANORAMA:
            # two dispatches: the fused pano extract faults the TPU worker
            # (see the _jitted_extract_geom/_filter comment above)
            xyz, colors = _jitted_extract_geom(
                self.camera_type, poses, self.rig[view], disps, intr_grid,
                images,
            )
            mask = _jitted_extract_filter(
                Nb, poses, self.rig[view], disps, pin, masks,
                jnp.float32(filter_thresh), jnp.int32(n),
            )
        else:
            xyz, colors, mask = _jitted_extract_map(
                self.camera_type, Nb, poses, self.rig[view], disps,
                intr_grid, pin, masks, images,
                jnp.float32(filter_thresh), jnp.int32(n),
            )
        return SLAMMap(
            xyz=np.asarray(xyz[:n]),
            rgb=np.asarray(colors[:n]),
            mask=np.asarray(mask[:n]),
            frame_inds=self.tstamp[:n].copy(),
        )
