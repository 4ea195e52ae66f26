"""DeAOT tracker: mask propagation engine over the flax DeAOT network.

Reference: /root/reference/vipe/priors/track_anything/aot/networks/engines/
{aot_engine,deaot_engine}.py + aot_tracker.py glue.  ViPE runs R50_DeAOTL
with ``long_term_mem_gap=9999`` (__init__.py:73-77), i.e. long-term memory
grows only at reference (detection) frames; short-term memory is replaced
every frame.

TPU-native memory layout: long-term memory is a host-side list of per-frame
token blocks; each propagate concatenates and pads it to a power-of-two
frame bucket with a validity mask, so the whole step is one of a handful of
compiled programs regardless of how many reference frames accumulated.

Documented divergence: the reference spawns one sub-engine per 10 objects
(DeAOTInferEngine.separate_mask); this port tracks up to ``max_obj_num``
objects in one engine and drops overflow ids (rare at ViPE's box threshold).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .network import DeAOTConfig, DeAOTNet, resize_align_corners

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def _bucket_frames(n: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return b


class DeAOTTracker:
    """Tracker API used by TrackAnythingPipeline:
    ``add_reference(rgb, instance)`` and ``propagate(rgb) -> instance``."""

    def __init__(self, cfg: Optional[DeAOTConfig] = None, params=None,
                 max_long_edge: int = 1040, rng_seed: int = 0):
        self.cfg = cfg or DeAOTConfig()
        self.net = DeAOTNet(self.cfg)
        self.max_long_edge = max_long_edge
        if params is None:
            from ....models import zoo

            params = zoo.load_params("deaot")
        self._params = params
        self._rng_seed = rng_seed
        # per-layer long-term memory: list over ref frames of
        # (K (hw,B,dk), V, ID_V) token blocks
        self.long_memory: Optional[List[List[tuple]]] = None
        self.short_memory = None     # per-layer (local_K, local_V, local_ID_V)
        self.curr_mem = None         # per-layer (curr_K, curr_V, curr_ID_V)
        # object-id ↔ slot mapping (slots 1..max_obj_num)
        self.id_to_slot: Dict[int, int] = {}
        self.slot_to_id: Dict[int, int] = {}

        # Transfer discipline (the whole point of these wrappers): images
        # cross the host→device boundary as uint8 (~4× less than f32) and
        # masks as uint8 SLOT MAPS (~44× less than a f32 one-hot) —
        # normalization and one-hot expansion happen IN the jitted programs;
        # the propagate output crosses back as a uint8 slot map.  Measured
        # on the remote-TPU tunnel the old f32/one-hot transfers dominated
        # the full-pipeline budget (~4.6 s/frame of track_anything).
        C = self.cfg.max_obj_num + 1

        def _norm(img_u8):
            return (
                img_u8.astype(jnp.float32) / 255.0
                - jnp.asarray(IMAGENET_MEAN)
            ) / jnp.asarray(IMAGENET_STD)

        self._jit_ref = jax.jit(
            lambda p, img_u8, slots_u8: self.net.apply(
                p, _norm(img_u8),
                jax.nn.one_hot(slots_u8.astype(jnp.int32), C),
                method=_ref_step,
            )
        )

        def _prop(p, img_u8, gK, gV, gI, km, lK, lV, lI, h0, w0):
            h1, w1 = img_u8.shape[1], img_u8.shape[2]
            logits, currs = self.net.apply(
                p, _norm(img_u8), gK, gV, gI, km, lK, lV, lI,
                method=_prop_step,
            )
            # reference decode: bilinear(align_corners) logits to the input
            # size, then argmax (aot_engine decode path); the memory update
            # consumes the MODEL-res argmax (the engine works at model size)
            full = resize_align_corners(logits, (h0, w0))
            slot_full = jnp.argmax(full[0], -1).astype(jnp.uint8)
            model = resize_align_corners(logits, (h1, w1))
            slot_small = jnp.argmax(model, -1).astype(jnp.uint8)  # (1,h1,w1)
            # short-term memory refresh fused into the SAME program (the
            # whole per-frame propagate is ONE dispatch + one uint8
            # readback); callers discard it on no-update (detection) frames
            new_short = self.net.apply(
                p, currs, jax.nn.one_hot(slot_small.astype(jnp.int32), C),
                method=_update_step,
            )
            return slot_full, new_short

        self._jit_prop = jax.jit(_prop, static_argnums=(9, 10))
        self._gmem = None  # cached padded long-term memory (per propagate)

    # ------------------------------------------------------------ helpers

    def _preprocess(self, rgb: np.ndarray) -> jnp.ndarray:
        """Resize to the model grid and upload as (1, h1, w1, 3) uint8 —
        normalization happens inside the jitted steps (a f32 upload is 4×
        the bytes; the ≤0.5/255 resize quantization is far below the bf16
        compute noise)."""
        import cv2

        h, w = rgb.shape[:2]
        s = min(1.0, self.max_long_edge / max(h, w))
        h1 = max(16, int(round(h * s / 16)) * 16)
        w1 = max(16, int(round(w * s / 16)) * 16)
        a = np.asarray(rgb)
        if a.dtype != np.uint8:
            a = np.clip(a * 255.0 if a.max() <= 1.5 else a, 0, 255)
            a = a.astype(np.uint8)
        img = cv2.resize(a, (w1, h1))
        return jnp.asarray(img)[None]

    def _slots_host(self, instance: np.ndarray, size_hw) -> jnp.ndarray:
        """Instance ids → (1, H, W) uint8 SLOT map (uploaded; the one-hot
        expansion happens on device), updating the id↔slot tables for new
        objects.  LUT-translated in one gather — a per-object full-res
        boolean pass costs O(objects·H·W) host time, which at ~100 tracked
        objects dominated the per-frame budget."""
        import cv2

        inst = cv2.resize(
            np.asarray(instance, np.int32), (size_hw[1], size_hw[0]),
            interpolation=cv2.INTER_NEAREST,
        )
        ids = np.unique(inst)
        free_iter = None
        for oid in ids:
            if oid == 0 or oid in self.id_to_slot:
                continue
            if free_iter is None:
                free_iter = iter(
                    s for s in range(1, self.cfg.max_obj_num + 1)
                    if s not in self.slot_to_id
                )
            s = next(free_iter, None)
            if s is None:
                continue  # overflow: drop (documented divergence)
            self.id_to_slot[oid] = s
            self.slot_to_id[s] = oid
        lut = np.zeros(int(ids.max()) + 1 if len(ids) else 1, np.uint8)
        for oid in ids:
            if oid > 0 and oid in self.id_to_slot:
                lut[oid] = self.id_to_slot[oid]
        return jnp.asarray(lut[inst])[None]

    def _slots_to_ids(self, slot_map: np.ndarray) -> np.ndarray:
        lut = np.zeros(self.cfg.max_obj_num + 1, slot_map.dtype)
        for s, oid in self.slot_to_id.items():
            lut[s] = oid
        return lut[slot_map]

    def _ensure_params(self, img_u8, slots_u8):
        if self._params is None:
            img = (
                np.asarray(img_u8, np.float32) / 255.0 - IMAGENET_MEAN
            ) / IMAGENET_STD
            oh = jax.nn.one_hot(
                jnp.asarray(slots_u8, jnp.int32), self.cfg.max_obj_num + 1
            )
            self._params = self.net.init(
                jax.random.PRNGKey(self._rng_seed), jnp.asarray(img), oh,
                method=_init_all,
            )
        return self._params

    def _padded_long(self):
        """Concatenate + bucket-pad the long-term memory per layer."""
        n = len(self.long_memory[0])
        nb = _bucket_frames(n)
        gKs, gVs, gIs = [], [], []
        hw = self.long_memory[0][0][0].shape[0]
        for layer_mem in self.long_memory:
            K = jnp.concatenate([m[0] for m in layer_mem], 0)
            V = jnp.concatenate([m[1] for m in layer_mem], 0)
            I = jnp.concatenate([m[2] for m in layer_mem], 0)
            pad = nb * hw - K.shape[0]
            if pad:
                K = jnp.pad(K, ((0, pad), (0, 0), (0, 0)))
                V = jnp.pad(V, ((0, pad), (0, 0), (0, 0)))
                I = jnp.pad(I, ((0, pad), (0, 0), (0, 0)))
            gKs.append(K)
            gVs.append(V)
            gIs.append(I)
        kmask = jnp.arange(nb * hw) < n * hw
        return gKs, gVs, gIs, kmask[None]  # (B=1, T)

    # ---------------------------------------------------------------- API

    def restart(self):
        self.long_memory = None
        self.short_memory = None
        self.curr_mem = None
        self._gmem = None
        self.id_to_slot.clear()
        self.slot_to_id.clear()

    def add_reference(self, rgb: np.ndarray, instance: np.ndarray):
        """Encode a (frame, mask) pair into long+short-term memory
        (engine add_reference_frame, aot_engine.py:195-252; new memories are
        PREPENDED to long-term memory per update_long_term_memory:294-310)."""
        img = self._preprocess(rgb)
        slots = self._slots_host(instance, img.shape[1:3])
        params = self._ensure_params(img, slots)
        layer_mems = self._jit_ref(params, img, slots)
        if self.long_memory is None:
            self.long_memory = [[m["global"]] for m in layer_mems]
        else:
            for i, m in enumerate(layer_mems):
                self.long_memory[i].insert(0, m["global"])
        self.short_memory = [m["local"] for m in layer_mems]
        self._gmem = None  # padded concat cache is stale

    def propagate(self, rgb: np.ndarray, update_memory: bool = True) -> np.ndarray:
        """Track one frame (match_propogate_one_frame + decode_current_logits
        + update_short_term_memory, aot_engine.py:348-380).

        ONE jitted dispatch per frame: normalize → encode → match → decode →
        resize+argmax AND the short-term memory refresh (which consumes the
        MODEL-res slot map without a host round trip — the reference engine
        likewise updates memory at model size) are fused into a single
        program; the only per-frame transfers are the uint8 image upload
        and the uint8 slot-map readback.  The padded long-term memory
        concat is cached between reference updates instead of re-dispatched
        per frame."""
        if self.long_memory is None:
            return np.zeros(rgb.shape[:2], np.int32)
        from ....utils import profiling

        with profiling.stage("ta_preprocess"):
            img = self._preprocess(rgb)
        if self._gmem is None:
            self._gmem = self._padded_long()
        gK, gV, gI, kmask = self._gmem
        lK, lV, lI = zip(*self.short_memory)
        h0, w0 = rgb.shape[:2]
        with profiling.stage("ta_prop_dispatch"):
            slot_full, new_short = self._jit_prop(
                self._params, img, list(gK), list(gV), list(gI), kmask,
                list(lK), list(lV), list(lI), h0, w0,
            )
        with profiling.stage("ta_readback"):
            slot_np = np.asarray(slot_full).astype(np.int32)
        ids = self._slots_to_ids(slot_np)
        if update_memory:
            self.short_memory = new_short
        return ids


# --------------------------- model methods used through nn.Module.apply


def _init_all(net: DeAOTNet, img, one_hot):
    """Parameter-initialization pass touching every submodule (ref + prop +
    update paths)."""
    mems = _ref_step(net, img, one_hot)
    gK = [m["global"][0] for m in mems]
    gV = [m["global"][1] for m in mems]
    gI = [m["global"][2] for m in mems]
    kmask = jnp.ones((1, gK[0].shape[0]), bool)
    lK, lV, lI = zip(*[m["local"] for m in mems])
    logits, currs = _prop_step(
        net, img, gK, gV, gI, kmask, list(lK), list(lV), list(lI)
    )
    _update_step(net, currs, one_hot)
    return logits


def _ref_step(net: DeAOTNet, img, one_hot):
    """Reference-frame self-matching: returns per-layer global token memory
    + local 2D memory."""
    enc = net.encode_image(img)
    B, h, w, _ = enc[-1].shape
    id_emb = net.get_id_emb(one_hot)
    _, mems = net.lstt_forward(enc, None, id_emb, None, (h, w))
    out = []
    for m in mems:
        K, V, I = m["global_K"], m["global_V"], m["global_ID_V"]
        local = tuple(
            x.transpose(1, 0, 2).reshape(B, h, w, x.shape[-1])
            for x in (K, V, I)
        )
        out.append({"global": (K, V, I), "local": local})
    return out


def _prop_step(net: DeAOTNet, img, gKs, gVs, gIs, kmask, lKs, lVs, lIs):
    """Propagation: match against memory, decode logits, return raw current
    K/V/ID_V for the post-decision memory update."""
    enc = net.encode_image(img)
    B, h, w, _ = enc[-1].shape
    memories = [
        {
            "global_K": gKs[i], "global_V": gVs[i], "global_ID_V": gIs[i],
            "local_K": lKs[i], "local_V": lVs[i], "local_ID_V": lIs[i],
        }
        for i in range(len(gKs))
    ]
    outs, mems = net.lstt_forward(
        enc, memories, None, None, (h, w), long_mask=kmask
    )
    logits = net.decode_logits(outs[-1], enc, (h, w))
    currs = [(m["curr_K"], m["curr_V"], m["curr_ID_V"]) for m in mems]
    return logits, currs


def _update_step(net: DeAOTNet, currs, one_hot):
    """Short-term memory refresh from the predicted mask
    (deaot_engine.py:25-62: fuse_key_value_id per layer, then 2D planes)."""
    id_emb = net.get_id_emb(one_hot)
    out = []
    for i, (K, V, IDV) in enumerate(currs):
        fused = net.fuse_id_memory(i, IDV, id_emb)
        L, B, _ = K.shape
        h = one_hot.shape[1] // 16
        w = one_hot.shape[2] // 16
        local = tuple(
            x.transpose(1, 0, 2).reshape(B, h, w, x.shape[-1])
            for x in (K, V, fused)
        )
        out.append(local)
    return out
