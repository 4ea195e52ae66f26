"""SLAMSystem: the two-pass driver (reference
/root/reference/vipe/slam/system.py:79-316).

Pass 1: motion-filter every frame → keyframe buffer → frontend tracking with
interleaved backend runs.  Then global backend BA ×2.  Pass 2: re-iterate all
frames, interpolating non-keyframe poses per 16-frame chunk (InnerFiller).
Returns camera-to-world trajectory, refined intrinsics and the filtered SLAM
map.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import cameras as cam
from ..ops import lie
from ..utils import jaxutil, profiling
from ..streams.base import FrameAttribute, ProcessedVideoStream, StreamProcessor, VideoFrame, VideoStream
from .backend import SLAMBackend
from .buffer import GraphBuffer
from .frontend import SLAMFrontend
from .inner_filler import InnerFiller
from .interface import SLAMOutput
from .motion_filter import MotionFilter


class StandardResizeStreamProcessor(StreamProcessor):
    """Resize every input to ≈384·512 px area, crop to /8 multiples
    (reference system.py:40-76); remembers the factors so intrinsics can be
    mapped back to the original resolution at the end."""

    def __init__(self, target_area: int = 384 * 512):
        self.target_area = target_area
        self.fac_x = self.fac_y = 1.0
        self.scx = self.scy = 0

    def _compute(self, prev):
        h0, w0 = prev
        scale = float(np.sqrt(self.target_area / (h0 * w0)))
        h1, w1 = int(h0 * scale), int(w0 * scale)
        ch, cw = h1 % 8, w1 % 8
        top, bottom = ch // 2, ch - ch // 2
        left, right = cw // 2, cw - cw // 2
        self.fac_x, self.fac_y = w0 / w1, h0 / h1
        self.scx, self.scy = left, top
        return (h1, w1), (top, bottom, left, right)

    def update_frame_size(self, previous):
        (h1, w1), (t, b, l, r) = self._compute(previous)
        return h1 - t - b, w1 - l - r

    def __call__(self, frame_idx: int, frame: VideoFrame) -> VideoFrame:
        (h1, w1), (t, b, l, r) = self._compute(frame.size())
        return frame.resize((h1, w1)).crop(t, b, l, r)

    def recover_intrinsics(self, intr: np.ndarray) -> np.ndarray:
        out = np.asarray(intr).copy()
        out[2] += self.scx
        out[3] += self.scy
        out[0:4:2] *= self.fac_x
        out[1:4:2] *= self.fac_y
        return out


@functools.lru_cache(maxsize=1)
def default_droidnet():
    """Process-level singleton: one DroidNet + params + jitted closures.

    A fresh model per SLAMSystem would mint new jit closures and recompile
    the whole hot path for every video (run.py processes many)."""
    from ..models import zoo
    from ..models.droidnet import init_droidnet

    model, params = init_droidnet(jax.random.PRNGKey(0))
    zoo_params = zoo.load_params("droidnet")
    if zoo_params is not None:
        params = zoo_params
    ef, ec, uf = make_droidnet_fns(model)
    return model, params, ef, ec, uf


def make_droidnet_fns(model):
    """Jitted (encode_features, encode_context, update_fn) closures over a
    flax DroidNet; ``update_fn`` matches the FactorGraph injection protocol."""

    @jax.jit
    def encode_features(params, images):
        return model.apply(params, images, method=model.encode_features)

    @jax.jit
    def encode_context(params, images):
        return model.apply(params, images, method=model.encode_context)

    @functools.partial(jax.jit, static_argnums=(7,))
    def update_fn(params, net, inp, corr, motn, ii, jj, num_frames):
        del jj  # DroidNet's GraphAgg only uses the source index
        return model.apply(
            params, net, inp, corr, motn, ii, num_frames,
            method=lambda m, *a: m.update(*a),
        )

    return encode_features, encode_context, update_fn


class SLAMSystem:
    """Single-video SLAM driver.  ``config`` is a plain dict (the hydra-like
    layer lives in vipe_tpu.utils.config)."""

    def __init__(self, config: Optional[dict] = None, update_fn=None, params=None,
                 encode_features=None, encode_context=None, metric_depth=None):
        self.config = dict(config or {})
        if update_fn is None:
            _, params_init, encode_features, encode_context, update_fn = (
                default_droidnet()
            )
            params = params if params is not None else params_init
        self.update_fn = update_fn
        self.params = params
        self.encode_features = encode_features
        self.encode_context = encode_context
        self.metric_depth = metric_depth

    def run(
        self,
        video_stream,
        camera_type: cam.CameraType = cam.CameraType.PINHOLE,
        rig: Optional[np.ndarray] = None,
    ) -> SLAMOutput:
        """``video_stream``: a single VideoStream, or a MultiviewVideoList /
        list of per-view streams with ``rig`` (V, 7) camera-to-rig SE3
        (reference system.py:208-230 — rig required for V > 1)."""
        from ..streams.base import MultiviewVideoList

        c = self.config
        if isinstance(video_stream, MultiviewVideoList):
            raw_streams = [video_stream[i] for i in range(len(video_stream))]
            rig = video_stream.rig if rig is None else rig
        elif isinstance(video_stream, (list, tuple)):
            raw_streams = list(video_stream)
        else:
            raw_streams = [video_stream]
        V = len(raw_streams)
        assert V == 1 or rig is not None, "need rig for multiple views"

        area = c.get("resize_area", 384 * 512)
        resizers = [
            StandardResizeStreamProcessor(target_area=area) for _ in raw_streams
        ]
        streams = [
            ProcessedVideoStream(s, [r])
            for s, r in zip(raw_streams, resizers)
        ]
        stream = streams[0]
        h, w = stream.frame_size()
        for s in streams[1:]:
            assert s.frame_size() == (h, w)
            assert len(s) == len(stream)
        total = len(stream)
        has_init_pose = FrameAttribute.POSE in stream.attributes()
        c = {**c, "has_init_pose": has_init_pose}

        buffer = GraphBuffer(
            height=h, width=w,
            buffer_size=c.get("buffer", 1024),
            init_disp=c.get("init_disp", 1.0),
            camera_type=camera_type,
            dense_disp_alpha=c.get("ba", {}).get("dense_disp_alpha", 0.001),
            n_views=V,
            rig=rig,
        )
        from .sparse_tracks import build_sparse_tracks

        sparse_tracks = build_sparse_tracks(c.get("sparse_tracks"), V)
        buffer.sparse_tracks = sparse_tracks
        motion_filter = MotionFilter(
            self.encode_features, self.encode_context, self.update_fn,
            self.params, thresh=c.get("filter_thresh", 2.4),
            sparse_tracks=sparse_tracks,
        )
        frontend = SLAMFrontend(buffer, self.update_fn, self.params, c)
        backend = SLAMBackend(buffer, self.update_fn, self.params, c)
        backend.depth_model = self.metric_depth
        filler = InnerFiller(buffer, self.update_fn, self.params, c)

        # live telemetry (reference system.py:243-246 streams to rerun when
        # slam.visualize=true; here: polled atomic npz snapshots)
        tele = None
        if c.get("visualize"):
            from ..utils.telemetry import TelemetryWriter

            try:
                tele_name = raw_streams[0].name()
            except Exception:
                tele_name = "slam"
            tele = TelemetryWriter(
                c.get("visualize_path", "vipe_telemetry"),
                name=tele_name,
                every=c.get("visualize_every", 8),
            )

        fbi = c.get("frontend_backend_iters", [16, 64, 256])
        profile = os.environ.get("VIPE_PROFILE") == "1"
        trace_dir = os.environ.get("VIPE_TRACE")
        if trace_dir:
            try:  # device-side capture may be unsupported over the tunnel
                jax.profiler.start_trace(trace_dir)
            except Exception:
                trace_dir = None
        tmarks = {}

        def mark(name, t0):
            if profile:
                tmarks[name] = tmarks.get(name, 0.0) + (time.perf_counter() - t0)

        def _upload_host(frames):
            """Host float RGB → host uint8 (4× smaller transfer when later
            uploaded).  V=1: (h, w, 3); V>1: stacked (V, h, w, 3)."""
            imgs = [
                (np.clip(f.rgb, 0.0, 1.0) * 255).astype(np.uint8)
                for f in frames
            ]
            return imgs[0] if V == 1 else np.stack(imgs)

        def _upload(frames):
            return jnp.asarray(_upload_host(frames))

        def _masks_host(frames):
            """Full-res valid-mask → 1/8 invalid-mask, on host (reference
            system.py:188-199): downsample, keep pixels whose valid fraction
            > 0.9, invert."""
            import cv2

            ms = [f.mask for f in frames]
            if all(m is None for m in ms):
                return None
            built = [
                ~(cv2.resize(
                    np.asarray(
                        m if m is not None else np.ones((h, w), bool),
                        np.float32,
                    ), (buffer.wd, buffer.ht),
                    interpolation=cv2.INTER_LINEAR,
                ) > 0.9)
                for m in ms
            ]
            return built[0] if V == 1 else np.stack(built)

        def _masks(frames):
            m = _masks_host(frames)
            return None if m is None else jnp.asarray(m)

        # deterministic keyframe cadence (benchmarking / reproducibility
        # knob; None = pure motion-filter gating like the reference)
        kf_stride = c.get("keyframe_stride")

        def _encode_all(rgb_dev):
            imgs = rgb_dev if V > 1 else rgb_dev[None]
            fmap = self.encode_features(self.params, imgs)
            net, inp = self.encode_context(self.params, imgs)
            if V == 1:
                return fmap[0], net[0], inp[0]
            return fmap, net, inp

        def _frame_meta(frames):
            """(metric_depth, intrinsics) stacked over views."""
            if V == 1:
                return frames[0].metric_depth, frames[0].intrinsics
            md = (
                np.stack([f.metric_depth for f in frames])
                if all(f.metric_depth is not None for f in frames) else None
            )
            intr = (
                np.stack([np.asarray(f.intrinsics) for f in frames])
                if all(f.intrinsics is not None for f in frames) else None
            )
            return md, intr

        def _base_pose(frames):
            """w2c of the rig base from the view-0 frame pose (reference
            system.py:158-159: rig_v · pose_v⁻¹)."""
            if frames[0].pose is None:
                return None
            w2c = lie.se3_inv(jnp.asarray(frames[0].pose, jnp.float32))
            if V > 1:
                w2c = lie.se3_mul(buffer.rig[0], w2c)
            return np.asarray(w2c)

        def _process(entry, force_kf: bool):
            """Resolve a pipelined keyframe decision, add + track."""
            frame_idx, frames, rgb_dev, bmask, token = entry
            if kf_stride:
                force_kf = force_kf or (frame_idx % kf_stride == 0)
            t0 = time.perf_counter()
            if token is None:
                # frame was statically known to be a non-keyframe (fixed
                # decision + stride) — no encode was run for it
                is_kf = force_kf
                if is_kf:
                    if rgb_dev is None:
                        rgb_dev = _upload(frames)
                    if bmask is None:
                        bmask = _masks(frames)
                    fmap, net, inp = _encode_all(rgb_dev)
            else:
                is_kf = motion_filter.resolve(token)
                mark("mf_resolve", t0)
                if is_kf:
                    # the filter already encoded this frame on promotion
                    fmap, net, inp = motion_filter.last_keyframe_features
                elif force_kf:
                    is_kf = True
                    fmap = token.fmap  # computed at submit
                    if V == 1:
                        fmap = fmap[0]
                    imgs = rgb_dev if V > 1 else rgb_dev[None]
                    net, inp = self.encode_context(self.params, imgs)
                    if V == 1:
                        net, inp = net[0], inp[0]
            if is_kf:
                # apply deferred keyframe-removal decisions, keeping the
                # NEWEST one deferred (depth-2 speculation): its readback
                # resolves at the keyframe after next, fully overlapped
                t0 = time.perf_counter()
                frontend.resolve_pending(keep_newest=True)
                mark("fe_resolve_pending", t0)
                t0 = time.perf_counter()
                metric_depth, intrinsics = _frame_meta(frames)
                buffer.append_keyframe(
                    frame_idx, rgb_dev, fmap, net, inp,
                    mask=bmask,
                    metric_depth=metric_depth,
                    intrinsics=intrinsics,
                    pose=_base_pose(frames),
                )
                if self.metric_depth is not None and metric_depth is None:
                    buffer.update_disps_sens(
                        self.metric_depth, frame_idx=buffer.n_frames - 1
                    )
                mark("kf_append", t0)
            t0 = time.perf_counter()
            frontend.run()
            mark("fe_run", t0)
            if tele is not None and is_kf:
                tele.update(buffer)
            if is_kf and any(
                buffer.n_frames - k in fbi for k in range(3)
            ):
                # n_frames may run up to two high while removal decisions
                # are pending — resolve all, then re-check the milestone
                frontend.resolve_pending()
                if buffer.n_frames in fbi:
                    backend.run_if_necessary(5)
                    # backend moved poses/disps → speculative distances are
                    # stale
                    frontend.drop_cached_distance()

        # ----------------------------------------------------------- pass 1
        # software pipeline of depth ``filter_pipeline_depth`` (default 2):
        # frame k's decision readback overlaps frames k+1..k+D's upload +
        # encoder — the score's GRU compute AND its device→host transfer
        # complete in the shadow of later frames' work.  Decisions are
        # UNCHANGED vs depth 1: a token whose keyframe reference goes stale
        # (a promotion happened after its submit) is asynchronously
        # re-scored by refresh().  With a fixed stride + constant filter
        # decision, non-keyframes are statically known: skip their upload
        # AND encoder entirely (they are consumed again in pass 2).
        skip_non_kf = bool(kf_stride) and motion_filter._decision_fixed is False
        mf_depth = max(int(c.get("filter_pipeline_depth", 2)), 1)

        # fmap PARKING: every frame's feature map is stashed in a device
        # parking store during pass 1, so pass-2 appends for non-keyframes
        # become one device row-copy each — no re-upload, no re-encode.
        # In live-filter mode the fmap is already computed for scoring
        # (previously thrown away for non-keyframes) — a pure win.  In
        # fixed-stride skip mode parking must ADD a per-frame upload +
        # batch-1 encode to pass 1 that otherwise rides the batched
        # (8-frames-per-transfer) pass-2 path, so it is opt-in there
        # (park_fmaps_in_skip_mode) pending tunnel measurement.  Only
        # valid when the fused filler will run (an infill row's only live
        # content is its fmap).
        park_cap = int(c.get("park_fmaps_max_frames", 2048))
        park_enabled = (
            V == 1 and not filler.needs_context and total <= park_cap
            and (not skip_non_kf or c.get("park_fmaps_in_skip_mode", False))
        )
        park = None
        parked = {}

        def _park(frame_idx, fmap_row):
            nonlocal park
            if park is None:
                park = jnp.zeros(
                    (total,) + tuple(fmap_row.shape), jnp.bfloat16
                )
            park = jaxutil.set_rows(park, frame_idx, fmap_row[None])
            parked[frame_idx] = frame_idx

        def _park_block(start_idx, rows):
            """Park a contiguous block of fmap rows in one donated dispatch
            (the grouped pass-1 path: frame indices are consecutive)."""
            nonlocal park
            if park is None:
                park = jnp.zeros(
                    (total,) + tuple(rows.shape[1:]), jnp.bfloat16
                )
            park = jaxutil.set_rows(
                park, start_idx, rows.astype(jnp.bfloat16)
            )
            for k in range(rows.shape[0]):
                parked[start_idx + k] = start_idx + k

        # host→device feed prefetch (SURVEY §2.6.4): decode/resize, uint8
        # conversion, mask build and the upload itself run on a side thread
        # up to prefetch_depth frames ahead — the tracking loop's blocking
        # readbacks release the GIL, and the thread fills that shadow.
        # Dispatches (encoders, scores) stay on this thread; decisions are
        # timing-independent, so depth cannot change results (0 = sync).
        from ..utils.prefetch import ThreadPrefetcher

        pf_depth = int(c.get("prefetch_depth", 2))

        def _prepare1(entry):
            frame_idx, frames = entry
            t0 = time.perf_counter()
            if skip_non_kf and frame_idx % kf_stride != 0:
                rgb_dev = _upload(frames) if park_enabled else None
                bmask = None
            else:
                rgb_dev = _upload(frames)
                bmask = _masks(frames)
            mark("upload", t0)
            return frame_idx, frames, rgb_dev, bmask

        # GROUPED pass-1 feed (live-filter mode, V=1): ``upload_batch``
        # frames share ONE stacked host→device transfer, ONE feature-encode
        # dispatch, ONE batched score dispatch and ONE vector readback
        # (motion_filter.submit_group) — per-frame 0.6 MB transfers are
        # tunnel-overhead-bound exactly like the pass-2 encode batches.
        # Decisions are unchanged: stale tokens re-score via refresh().
        # default 8: hardware A/B (one process, one tunnel day) measured
        # real-mode 20.47 fps at UB=1, 21.24 at UB=4, 23.61 at UB=8 — the
        # stacked transfer amortizes per-transfer tunnel overhead; decisions
        # are timing-independent (stale tokens re-score on promotion)
        UB = int(c.get("upload_batch", 8))
        live_group = (
            UB > 1 and V == 1 and not skip_non_kf
            and not getattr(self.update_fn, "host_only", False)
        )

        def _group_iter(src, size):
            grp = []
            for e in src:
                grp.append(e)
                if len(grp) == size:
                    yield grp
                    grp = []
            if grp:
                yield grp

        def _prepare1g(group):
            """Host work for a frame group + one stacked upload (+ masks),
            padded to the ``upload_batch`` bucket so encode/score program
            shapes repeat across the tail group."""
            t0 = time.perf_counter()
            rgbs = np.stack([_upload_host(fs) for _, fs in group])
            if len(group) < UB:
                rgbs = np.concatenate(
                    [rgbs, np.repeat(rgbs[-1:], UB - len(group), 0)]
                )
            rgb_block = jnp.asarray(rgbs)
            mask_block = [
                (lambda m: None if m is None else jnp.asarray(m))(
                    _masks_host(fs)
                )
                for _, fs in group
            ]
            mark("upload", t0)
            profiling.add("p1_upload", time.perf_counter() - t0)
            return group, rgb_block, mask_block

        def _drain(limit):
            while len(pending) > limit:
                t0 = time.perf_counter()
                _process(pending.pop(0), force_kf=limit == 0 and not pending)
                mark("process", t0)
                # if _process promoted a keyframe, the in-flight scores were
                # submitted against the old reference — re-score them
                # asynchronously now instead of blocking at their resolve
                # (refresh no-ops when the reference is current)
                for e in pending:
                    if e[4] is not None:
                        motion_filter.refresh(e[4])

        pending = []
        t_pass1 = time.perf_counter()
        if live_group:
            for group, rgb_block, mask_block in ThreadPrefetcher(
                _group_iter(enumerate(zip(*streams)), UB), _prepare1g,
                pf_depth,
            ):
                for frame_idx, frames in group:
                    sparse_tracks.track_image(frame_idx, frames)
                t0 = time.perf_counter()
                tokens, fmaps = motion_filter.submit_group(
                    rgb_block, mask_block, n_valid=len(group)
                )
                mark("mf_submit", t0)
                if park_enabled and fmaps is not None:
                    t0 = time.perf_counter()
                    _park_block(group[0][0], fmaps[: len(group)])
                    mark("park", t0)
                for i, ((frame_idx, frames), token) in enumerate(
                    zip(group, tokens)
                ):
                    pending.append(
                        (frame_idx, frames, rgb_block[i], mask_block[i],
                         token)
                    )
                    _drain(mf_depth)
        else:
            for frame_idx, frames, rgb_dev, bmask in ThreadPrefetcher(
                enumerate(zip(*streams)), _prepare1, pf_depth
            ):
                sparse_tracks.track_image(frame_idx, frames)
                if skip_non_kf and frame_idx % kf_stride != 0:
                    token = None
                    if park_enabled:
                        t0 = time.perf_counter()
                        fmap_nk = self.encode_features(
                            self.params, rgb_dev[None]
                        )
                        _park(frame_idx, fmap_nk[0])
                        mark("park", t0)
                else:
                    t0 = time.perf_counter()
                    token = motion_filter.submit(rgb_dev, bmask)
                    mark("mf_submit", t0)
                    if park_enabled:
                        _park(frame_idx, token.fmap[0])
                pending.append((frame_idx, frames, rgb_dev, bmask, token))
                _drain(mf_depth)
        _drain(0)
        mark("pass1_total", t_pass1)

        # ------------------------------------------------------- global BA
        frontend.resolve_pending()
        t0 = time.perf_counter()
        backend.run(7)
        backend.run(c.get("backend_iters", 24), update_depth=False)
        mark("backend", t0)
        if tele is not None:
            tele.update(buffer, force=True)

        # ----------------------------------------------------------- pass 2
        # batch the per-frame encoders (8 frames per dispatch) — pass 2 runs
        # them on EVERY frame, so per-call overhead dominates otherwise
        t_pass2 = time.perf_counter()
        filler.set_start_idx(buffer.n_frames)
        # frames that were pass-1 keyframes: their encoded features are
        # already resident in slots < start_idx — append by device-side row
        # copy instead of re-upload + re-encode (~1/3 of pass-2 transfers
        # at a 1-in-3 keyframe cadence)
        kf_slot = {int(t): i for i, t in enumerate(buffer.tstamp[:buffer.n_frames])}
        # in fused-filler mode infill rows' context encodings (nets/inps)
        # are never read — GRU sources are always keyframe rows — so the
        # context encoder can be skipped entirely for non-keyframes
        need_ctx = filler.needs_context
        ENC_BATCH = 8
        batch = []

        def _flush_batch():
            if not batch:
                return
            enc = [b for b in batch if b[4] is None]
            fmaps = nets = inps = rgbs = None
            msk_dev = None
            if enc:
                t0 = time.perf_counter()
                # ONE stacked upload for the whole batch: per-frame 0.6 MB
                # transfers are tunnel-overhead-bound (~2-5 ms each fully
                # pipelined; a single 8-frame transfer rides one round-trip)
                # V=1: (n, h, w, 3); V>1: (n·V, h, w, 3) flattened view-major
                rgbs_h = (
                    np.stack([b[2] for b in enc]) if V == 1
                    else np.concatenate([b[2] for b in enc], 0)
                )
                rgbs = jnp.asarray(rgbs_h)
                mark("p2_upload", t0)
                mh = [b[3] for b in enc if b[3] is not None]
                if mh:
                    mh = np.stack(mh) if V == 1 else np.concatenate(mh, 0)
                    msk_dev = jnp.asarray(mh)
                t0 = time.perf_counter()
                pad = ENC_BATCH * V - rgbs.shape[0]
                if pad:
                    rgbs = jnp.concatenate(
                        [rgbs, jnp.repeat(rgbs[-1:], pad, 0)]
                    )
                fmaps = self.encode_features(self.params, rgbs)
                if need_ctx:
                    nets, inps = self.encode_context(self.params, rgbs)
                mark("p2_encode", t0)
            k = 0
            km = 0  # counter over mask-carrying enc entries, in batch order
            for b in batch:
                frame_idx, frames, _rgb_h, bmask_h, src = b
                t0 = time.perf_counter()
                if isinstance(src, tuple):  # ("park", row): fmap row copy
                    buffer.append_keyframe_parked(park, src[1], frame_idx)
                elif src is not None:
                    buffer.append_keyframe_copy(src, frame_idx)
                else:
                    sl = slice(k * V, (k + 1) * V)
                    k += 1
                    metric_depth, _ = _frame_meta(frames)
                    if bmask_h is None:
                        bmask = None
                    else:
                        mi = km
                        km += 1
                        bmask = (
                            msk_dev[mi] if V == 1
                            else msk_dev[mi * V: (mi + 1) * V]
                        )
                    buffer.append_keyframe(
                        frame_idx,
                        rgbs[sl][0] if V == 1 else rgbs[sl],
                        fmaps[sl][0] if V == 1 else fmaps[sl],
                        (nets[sl][0] if V == 1 else nets[sl])
                        if need_ctx else None,
                        (inps[sl][0] if V == 1 else inps[sl])
                        if need_ctx else None,
                        mask=bmask, metric_depth=metric_depth,
                    )
                mark("p2_append", t0)
                if filler.check() or frame_idx == total - 1:
                    t0 = time.perf_counter()
                    filler.compute()
                    mark("p2_filler", t0)
            batch.clear()

        def _prepare2(entry):
            """Pass-2 host work (decode/resize/uint8/masks) off-thread; the
            batched uploads + encoders stay on the main thread."""
            frame_idx, frames = entry
            src = kf_slot.get(frame_idx)
            if src is not None:
                return (frame_idx, frames, None, None, src)
            if frame_idx in parked:
                return (frame_idx, frames, None, None,
                        ("park", parked[frame_idx]))
            return (frame_idx, frames, _upload_host(frames),
                    _masks_host(frames), None)

        for entry in ThreadPrefetcher(
            enumerate(zip(*streams)), _prepare2, pf_depth
        ):
            batch.append(entry)
            if len(batch) == ENC_BATCH:
                _flush_batch()
        _flush_batch()

        mark("pass2", t_pass2) if profile else None
        t0 = time.perf_counter()
        filled = filler.get_result()
        mark("filler_result", t0)
        if profile:
            n_kf = len(filler.filled_poses)
            print({k: round(v, 2) for k, v in tmarks.items()},
                  "keyframes:", frontend.t1, flush=True)
        if filled.poses.shape[0] != total:
            raise ValueError(
                "Video exhausted early — possibly malformed; "
                "try streams.cached=true"
            )

        if trace_dir:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
        t0 = time.perf_counter()
        slam_map = buffer.extract_slam_map(c.get("map_filter_thresh", 0.05))
        mark("extract_map", t0)
        t0 = time.perf_counter()
        if camera_type == cam.CameraType.PANORAMA:
            # panorama artifacts carry all-zero intrinsics (reference
            # streams/base.py:56); the pixel-unit equirect scales are an
            # internal SLAM-grid parameterization only
            intr_full = np.zeros_like(np.asarray(buffer.intrinsics))
        elif V == 1:
            intr_full = resizers[0].recover_intrinsics(
                np.asarray(buffer.intrinsics)
            )
        else:
            intr_full = np.stack([
                r.recover_intrinsics(np.asarray(buffer.intrinsics[v]))
                for v, r in enumerate(resizers)
            ])

        trajectory = np.asarray(lie.se3_inv(jnp.asarray(filled.poses)))
        mark("finalize", t0)
        from .factor_graph import _pdump

        _pdump(f"[system fg kf={frontend.t1}]")  # no-op without PROFILE_FG
        if profile:
            print({k: round(v, 2) for k, v in tmarks.items()
                   if k in ("extract_map", "finalize")}, flush=True)
        return SLAMOutput(
            trajectory=trajectory,
            intrinsics=intr_full,
            camera_type=camera_type,
            slam_map=slam_map,
            ba_residual=backend.last_residual,
            rig=np.asarray(buffer.rig) if V > 1 else None,
        )
