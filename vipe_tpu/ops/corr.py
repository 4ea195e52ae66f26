"""Correlation-volume construction and windowed lookup (XLA; Pallas-ready).

TPU-native equivalents of the reference CUDA kernels
``corr_index_forward`` (/root/reference/csrc/droid_net_ext/correlation_kernels.cu:23-66)
and ``altcorr_forward`` (altcorr_kernel.cu:27-130), wrapped by
``CorrBlock``/``AltCorrBlock`` (/root/reference/vipe/slam/networks/droid_net.py:48-176).

Two formulations, as in the reference:
  * ``corr_pyramid`` + ``corr_lookup``: materialize the all-pairs volume once
    per graph build (frontend — volumes are reused across GRU iterations),
    then lookups are cheap gathers.
  * ``alt_corr_lookup``: recompute the windowed dot products on the fly
    (backend — avoids materializing h1·w1 × h2·w2 over hundreds of edges).

Conventions: feature maps are NHWC ``(E, H, W, C)``; coords are ``(u, v)``
pixel coordinates at level-0 scale (divided by 2^l per level, like the
reference).  Both fmaps are pre-scaled by 1/4 so correlations carry the
reference's 1/16 normalization (droid_net.py:98-99,135).  Out-of-bounds
samples contribute zero (CUDA kernels bound-check and skip).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# opt-in Pallas lookup kernel (ops/pallas_corr.py): fuses the 4-level
# window lookup into one kernel with VMEM-resident selection matrices —
# enable on real TPU hardware after measuring (VIPE_PALLAS=1)
_USE_PALLAS = os.environ.get("VIPE_PALLAS") == "1"


@jax.tree_util.register_pytree_node_class
class QVol:
    """Per-edge int8-quantized correlation volume + per-edge dequant scale.

    ``q``: (E, h1, w1, h2, w2) int8, ``s``: (E,) f32 with
    ``vol ≈ q · s[:, None, None, None, None]``.  Registered as a pytree so
    it flows through jit signatures wherever a plain volume array does; row
    slicing (``p[:n]``) slices both members, matching the factor graph's
    in-program active-row slice.  Halves the stored-volume HBM footprint
    (the 4-video interleave OOM driver — ~1.2 GB/video bf16 at 48 edges)
    and halves lookup HBM traffic; dequantization is folded into the
    lookup output (the window contraction is linear in the volume)."""

    def __init__(self, q, s):
        self.q = q
        self.s = s

    def tree_flatten(self):
        return (self.q, self.s), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def __getitem__(self, idx):
        return QVol(self.q[idx], self.s[idx])

    @property
    def ndim(self):
        return self.q.ndim

    @property
    def shape(self):
        return self.q.shape

    @property
    def dtype(self):
        return self.q.dtype


def quantize_volume(vol):
    """Symmetric per-edge int8 quantization of a correlation volume.

    Returns (q int8, s f32 (E,)) with vol ≈ q·s.  The scale is per EDGE
    (not global): correlation magnitudes vary with feature content, and the
    GRU's corr encoder is sensitive to the window's relative structure —
    per-edge scaling keeps ~7 significant bits everywhere."""
    v = vol.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(v), axis=tuple(range(1, v.ndim)))
    s = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(
        jnp.round(v / s[(slice(None),) + (None,) * (v.ndim - 1)]),
        -127, 127,
    ).astype(jnp.int8)
    return q, s


def level_dims(ht: int, wd: int, level: int):
    """Target-plane dims at a pyramid level, clamped at 1 px so tiny test
    grids still produce the full 4-level (196-channel) feature stack."""
    return max(ht >> level, 1), max(wd >> level, 1)


def avg_pool2(x):
    """2x2 average pool, stride 2, over the trailing (..., H, W) dims.
    Dims already at 1 are left unpooled (clamped pyramid)."""
    h0, w0 = x.shape[-2], x.shape[-1]
    h, w = max(h0 // 2, 1), max(w0 // 2, 1)
    if h0 >= 2:
        x = x[..., : 2 * h, :].reshape(x.shape[:-2] + (h, 2, x.shape[-1]))
        x = x.mean(axis=-2)
    if w0 >= 2:
        x = x[..., : 2 * w].reshape(x.shape[:-1] + (w, 2))
        x = x.mean(axis=-1)
    return x


def avg_pool2_nhwc(x):
    """(E, H, W, C) → (E, max(H//2,1), max(W//2,1), C)."""
    x = jnp.moveaxis(x, -1, 1)  # (E, C, H, W)
    x = avg_pool2(x)
    return jnp.moveaxis(x, 1, -1)


def corr_volume(fmap1, fmap2):
    """All-pairs correlation: (E,H,W,C) x2 → (E, H, W, H, W), scaled 1/16.

    Written as an explicit batched matmul (E, P, C) @ (E, C, P) with bf16
    inputs and f32 accumulation — the naive 6-axis einsum lowers to a
    non-MXU path on TPU (measured 270 ms vs ~ms for 48 edges)."""
    E, H, W, C = fmap1.shape
    f1 = (fmap1.astype(jnp.float32) / 4.0).astype(jnp.bfloat16).reshape(E, H * W, C)
    f2 = (fmap2.astype(jnp.float32) / 4.0).astype(jnp.bfloat16).reshape(E, H * W, C)
    vol = jax.lax.dot_general(
        f1, f2, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return vol.reshape(E, H, W, H, W)


def corr_pyramid(fmap1, fmap2, num_levels: int = 4):
    """Pyramid over the TARGET dims only (reference droid_net.py:67-69).

    Computed by correlating fmap1 with PROGRESSIVELY POOLED target features:
    average-pooling the volume over (h2, w2) is linear in fmap2, so level
    l's volume equals the correlation against avgpool^l(fmap2) — the same
    values as pooling the materialized volume, at a fraction of the HBM
    traffic.  The old volume-then-pool form wrote a 1.8 GB f32 level-0
    transient and re-read it per level (measured 53 ms per 48-edge build on
    a v5e; this form ≈ 15 ms).  Volumes are bf16 (the reference computes
    correlation under fp16 autocast, droid_net.py:94-102)."""
    E, H, W, C = fmap1.shape
    f1 = (fmap1.astype(jnp.float32) / 4.0).astype(jnp.bfloat16)
    f1 = f1.reshape(E, H * W, C)
    f2 = (fmap2.astype(jnp.float32) / 4.0).astype(jnp.bfloat16)
    pyramid = []
    for _ in range(num_levels):
        h2, w2 = f2.shape[1], f2.shape[2]
        vol = jax.lax.dot_general(
            f1, f2.reshape(E, h2 * w2, C), (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        pyramid.append(vol.reshape(E, H, W, h2, w2))
        f2 = avg_pool2_nhwc(f2)
    return pyramid


def _gather_patch(vol, coords, radius):
    """Gather the (2r+2)² integer neighborhood around floor(coords).

    vol: (E, h1, w1, h2, w2) or (E, h2, w2, C) target plane per source pixel.
    Returns patch + bilinear weights (du, dv) and an in-bounds mask.
    """
    r = radius
    u = coords[..., 0]
    v = coords[..., 1]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = u - u0
    dv = v - v0
    offs = jnp.arange(2 * r + 2) - r
    xi = u0[..., None].astype(jnp.int32) + offs  # (E,h1,w1,S)
    yi = v0[..., None].astype(jnp.int32) + offs
    return xi, yi, du, dv


def _selection_matrix(centers, frac, size: int, radius: int):
    """Bilinear selection rows: (..., 2r+1, size) with
    row k = (1-frac)·onehot(center+k-r) + frac·onehot(center+k-r+1).

    Out-of-range taps get zero weight (CUDA kernels bound-check and skip).
    """
    k = 2 * radius + 1
    offs = jnp.arange(k) - radius
    base = centers[..., None] + offs  # (..., k) integer tap starts
    grid = jnp.arange(size)
    onehot0 = (base[..., None] == grid).astype(jnp.float32)
    onehot1 = ((base + 1)[..., None] == grid).astype(jnp.float32)
    f = frac[..., None, None]
    return (1.0 - f) * onehot0 + f * onehot1  # (..., k, size)


def corr_lookup(vol, coords, radius: int = 3, scale=None):
    """Sample a (2r+1)² window bilinearly from a materialized volume.

    vol: (E, h1, w1, h2, w2); coords: (E, h1, w1, 2) at this level's scale.
    Returns (E, h1, w1, (2r+1)²); parity with corr_index_forward.

    TPU-native formulation: the separable bilinear window lookup is two
    batched matmuls with sparse selection matrices,
    ``out = Wy @ vol @ Wxᵀ`` — XLA's generic gather for this access pattern
    measured ~680 ms for 48 edges; the matmul form rides the MXU.

    ``scale``: per-edge (E,) dequantization factor for int8 volumes, folded
    into the f32 output (the contraction is linear in the volume).
    """
    E, h1, w1, h2, w2 = vol.shape
    if vol.dtype == jnp.int8:
        # contract in bf16 (int8 operands don't mix with the fractional
        # selection weights); XLA fuses the convert into the einsum read
        vol = vol.astype(jnp.bfloat16)
    u = coords[..., 0]
    v = coords[..., 1]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = u - u0
    dv = v - v0
    Wy = _selection_matrix(v0.astype(jnp.int32), dv, h2, radius)  # (E,h1,w1,k,h2)
    Wx = _selection_matrix(u0.astype(jnp.int32), du, w2, radius)  # (E,h1,w1,k,w2)

    k = 2 * radius + 1
    P = h1 * w1
    # contract in the VOLUME's dtype (bf16 for stored pyramids): casting the
    # ~1 GB level-0 volume to f32 made the lookup HBM-bound (≈5 GB traffic,
    # ~30 ms); bf16 reads with f32 accumulation are ~5× less traffic.  The
    # reference computes correlation under fp16 autocast (droid_net.py:98).
    volf = vol.reshape(E, P, h2, w2)
    Wyf = Wy.reshape(E, P, k, h2).astype(vol.dtype)
    Wxf = Wx.reshape(E, P, k, w2).astype(vol.dtype)
    # NOTE einsum, not explicit dot_general: with the (E, P) mega-batch of
    # tiny matmuls XLA lowers einsum ~17x faster here (measured 18 ms vs
    # 312 ms for the 48-edge frontend graph)
    t = jnp.einsum("epkz,epzw->epkw", Wyf, volf,
                   preferred_element_type=vol.dtype)
    out = jnp.einsum("epkw,eplw->epkl", t, Wxf,
                     preferred_element_type=jnp.float32)
    out = out.reshape(E, h1, w1, k * k).astype(jnp.float32)
    if scale is not None:
        out = out * scale[:, None, None, None]
    return out


def corr_feat_pack(fmap1, fmap2, num_levels: int = 4):
    """Packed per-edge correlation FEATURES for the on-the-fly (altcorr)
    formulation: ``[f1, pool⁰(f2), …, pool^{L-1}(f2)]``, each pre-scaled by
    /4 (so dots carry the 1/16 normalization) and stored bf16.

    A drop-in row-wise replacement for ``corr_pyramid`` state: every entry
    is a per-edge array, so the graph's padded add/remove/permute machinery
    applies unchanged — at ~1/13 the memory (features, not volumes).
    ``corr_lookup_pyramid`` dispatches on entry ndim (4 = packed features,
    5 = materialized volumes)."""
    f1 = (fmap1.astype(jnp.float32) / 4.0).astype(jnp.bfloat16)
    f2 = (fmap2.astype(jnp.float32) / 4.0).astype(jnp.bfloat16)
    packed = [f1]
    for _ in range(num_levels):
        packed.append(f2)
        f2 = avg_pool2_nhwc(f2)
    return packed


def corr_lookup_pyramid(pyramid, coords, radius: int = 3):
    """Lookup every level at coords/2^l and concat channels (level-major).

    ``pyramid``: materialized volumes (entries (E, h1, w1, h2, w2)), int8
    quantized volumes (``QVol`` entries), or packed features from
    ``corr_feat_pack`` (entries (E, h, w, C)).
    Output (E, h1, w1, L·(2r+1)²) matching CorrBlock.__call__ channel order.
    """
    if pyramid and isinstance(pyramid[0], QVol):
        vols = [p.q for p in pyramid]
        scales = [p.s for p in pyramid]
        # int8 mode prefers the Pallas kernel on TPU: the dequant convert
        # happens in VMEM per block, so HBM reads stay int8 (half the bf16
        # traffic); the XLA path materializes a bf16 copy per lookup.
        if _USE_PALLAS or jax.default_backend() != "cpu":
            from .pallas_corr import corr_lookup_pyramid_pallas

            return corr_lookup_pyramid_pallas(
                vols, coords, radius=radius,
                interpret=jax.default_backend() == "cpu",
                scales=tuple(scales),
            )
        outs = [
            corr_lookup(vols[lvl], coords / (2.0**lvl), radius,
                        scale=scales[lvl])
            for lvl in range(len(vols))
        ]
        return jnp.concatenate(outs, axis=-1)
    if pyramid and pyramid[0].ndim == 4:
        f1 = pyramid[0]
        pools = list(pyramid[1:])
        if _USE_PALLAS:
            from .pallas_corr import corr_fused_pallas

            return corr_fused_pallas(
                f1, pools, coords, radius=radius,
                interpret=jax.default_backend() == "cpu", prescaled=True,
            )
        # contract in bf16: the (E,h1,w1,S,S,C) gathered-patch transient is
        # HBM-bandwidth-bound (measured ~8x slower than volume-mode lookups
        # in f32 on v5e) — halving its traffic is the cheapest lever; the
        # C=128 dot accumulates in f32 via preferred_element_type inside
        # einsum, matching the bf16 stored-volume precision of volume mode
        f1 = f1.astype(jnp.bfloat16)
        outs = [
            alt_corr_lookup_level(
                f1, pools[lvl].astype(jnp.bfloat16),
                coords / (2.0**lvl), radius,
            )
            for lvl in range(len(pools))
        ]
        return jnp.concatenate(outs, axis=-1)
    if _USE_PALLAS and pyramid and pyramid[0].ndim == 5:
        from .pallas_corr import corr_lookup_pyramid_pallas

        return corr_lookup_pyramid_pallas(
            list(pyramid), coords, radius=radius,
            interpret=jax.default_backend() == "cpu",
        )
    outs = []
    for lvl, vol in enumerate(pyramid):
        outs.append(corr_lookup(vol, coords / (2.0**lvl), radius))
    return jnp.concatenate(outs, axis=-1)


def fmap_pyramid(fmaps, num_levels: int = 4):
    """(N, H, W, C) feature pyramid (pre-scaled by 1/4) for alt-corr."""
    f = fmaps.astype(jnp.float32) / 4.0
    pyr = [f]
    for _ in range(num_levels - 1):
        f = avg_pool2_nhwc(f)
        pyr.append(f)
    return pyr


def alt_corr_lookup_level(fmap1, fmap2, coords, radius: int = 3):
    """On-the-fly windowed correlation at one level (altcorr_forward parity).

    fmap1: (E, h1, w1, C) level-0 source features (already /4).
    fmap2: (E, h2, w2, C) this level's target features (already /4).
    coords: (E, h1, w1, 2) at this level's scale.
    Returns (E, h1, w1, (2r+1)²).
    """
    E, h1, w1, C = fmap1.shape
    h2, w2 = fmap2.shape[1:3]
    xi, yi, du, dv = _gather_patch(None, coords, radius)
    okx = (xi >= 0) & (xi < w2)
    oky = (yi >= 0) & (yi < h2)
    xic = jnp.clip(xi, 0, w2 - 1)
    yic = jnp.clip(yi, 0, h2 - 1)

    ei = jnp.arange(E)[:, None, None, None, None]
    patch = fmap2[ei, yic[..., :, None], xic[..., None, :]]  # (E,h1,w1,S,S,C)
    mask = (oky[..., :, None] & okx[..., None, :]).astype(jnp.float32)
    dots = jnp.einsum(
        "eyxabc,eyxc->eyxab", patch, fmap1,
        preferred_element_type=jnp.float32,
    ) * mask

    w00 = ((1 - dv) * (1 - du))[..., None, None]
    w01 = ((1 - dv) * du)[..., None, None]
    w10 = (dv * (1 - du))[..., None, None]
    w11 = (dv * du)[..., None, None]
    out = (
        w00 * dots[..., :-1, :-1]
        + w01 * dots[..., :-1, 1:]
        + w10 * dots[..., 1:, :-1]
        + w11 * dots[..., 1:, 1:]
    )
    k = 2 * radius + 1
    return out.reshape(E, h1, w1, k * k)


def alt_corr_lookup(pyramid, coords, ii, jj, radius: int = 3):
    """Multi-level alt-corr over an edge list.

    pyramid: list of (N, h_l, w_l, C) from fmap_pyramid.
    coords: (E, h1, w1, 2) level-0 coords; ii/jj: (E,) frame indices.
    """
    outs = []
    f1 = pyramid[0][ii]
    for lvl, fm in enumerate(pyramid):
        outs.append(
            alt_corr_lookup_level(f1, fm[jj], coords / (2.0**lvl), radius)
        )
    return jnp.concatenate(outs, axis=-1)
