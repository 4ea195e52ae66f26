"""Pallas TPU kernel: fused 4-level correlation-pyramid window lookup.

Semantics identical to ``corr.corr_lookup_pyramid`` (the reference CUDA
``corr_index_forward``, /root/reference/csrc/droid_net_ext/
correlation_kernels.cu:23-66, applied per pyramid level): for every source
pixel, bilinearly sample a (2r+1)² window around ``coords / 2^level`` from
each level's materialized volume and concatenate channels level-major.

Why a kernel when the XLA einsum formulation already rides the MXU
(ops/corr.py:133): the einsum path materializes the bilinear SELECTION
matrices (E·P·k·(h2+w2)) and the row-contraction intermediate (E·P·k·w2)
in HBM — several hundred MB of round-trip traffic per lookup at frontend
scale, re-paid every GRU round.  Here both live only in VMEM, built on the
fly per source-row block; HBM traffic drops to the volume rows actually
read plus the (E,P,k²) output.

The kernel computes the same two-matmul contraction per pixel
(out = Wy · vol · Wxᵀ) with f32 accumulation, so results match the XLA
path to bf16 rounding.  Gated OFF by default (``VIPE_PALLAS=1`` or
``use_pallas_corr`` config) until measured faster on real hardware —
correctness is pinned by interpret-mode tests either way.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lookup_level(vol_blk, u, v, radius: int):
    """Windowed bilinear lookup for one level inside the kernel.

    vol_blk: (R, w1, h2, w2) f32 VMEM block (R source rows).
    u, v:    (R, w1) f32 coords at this level's scale.
    Returns (R, w1, k, k) f32.
    """
    R, w1, h2, w2 = vol_blk.shape
    k = 2 * radius + 1
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = (u - u0)[..., None, None]                      # (R, w1, 1, 1)
    dv = (v - v0)[..., None, None]

    offs = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0) - radius  # (k,1)

    # selection rows built in VMEM: (R, w1, k, size)
    def sel(center, frac, size):
        base = center[..., None, None].astype(jnp.int32) + offs  # (R,w1,k,1)
        grid = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, size), 3)
        one0 = (base == grid).astype(jnp.float32)
        one1 = (base + 1 == grid).astype(jnp.float32)
        return (1.0 - frac) * one0 + frac * one1

    Wy = sel(v0, dv, h2)                                # (R, w1, k, h2)
    Wx = sel(u0, du, w2)                                # (R, w1, k, w2)

    P = R * w1
    t = jax.lax.dot_general(                            # (P, k, w2)
        Wy.reshape(P, k, h2), vol_blk.reshape(P, h2, w2),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    out = jax.lax.dot_general(                          # (P, k, k)
        t, Wx.reshape(P, k, w2),
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(R, w1, k, k)


def _kernel_fused(coords_ref, f1_ref, *refs, radius: int, levels: int):
    """altcorr-style fused build+lookup: per source-row block, each level's
    correlation volume is computed ON THE MXU IN VMEM (f1_blk @ f2ᵀ) and
    immediately contracted with the bilinear window selection — the volume
    never exists in HBM.  TPU analog of the reference's shared-memory
    ``altcorr_forward`` (/root/reference/csrc/droid_net_ext/
    altcorr_kernel.cu:27-130)."""
    f2_refs = refs[:levels]
    out_ref = refs[levels]
    cr = coords_ref[0]                                   # (R, w1, 2)
    f1 = f1_ref[0]                                       # (R, w1, C) bf16
    R, w1, C = f1.shape
    k = 2 * radius + 1
    outs = []
    for lvl in range(levels):
        scale = 1.0 / (2.0 ** lvl)
        u = cr[..., 0] * scale
        v = cr[..., 1] * scale
        f2 = f2_refs[lvl][0]                             # (h2, w2, C) bf16
        h2, w2 = f2.shape[0], f2.shape[1]
        vol = jax.lax.dot_general(                       # (R·w1, h2·w2)
            f1.reshape(R * w1, C), f2.reshape(h2 * w2, C),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(R, w1, h2, w2)
        o = _lookup_level(vol, u, v, radius)
        outs.append(o.reshape(R, w1, k * k))
    out_ref[0] = jnp.concatenate(outs, axis=-1)


def corr_fused_pallas(
    fmap1, fmap2_pyr, coords, radius: int = 3, interpret: bool = False,
    row_block: int = 8, prescaled: bool = False,
):
    """Fused on-the-fly pyramid correlation lookup (no materialized volume).

    Drop-in for ``corr_pyramid(fmap1, fmap2) → corr_lookup_pyramid``:
    ``fmap1``: (E, h1, w1, C) RAW (unscaled) source features;
    ``fmap2_pyr``: list of (E, h2_l, w2_l, C) RAW target features pooled
    per level (chain of ``corr.avg_pool2_nhwc`` — NOT ``fmap_pyramid``,
    which pre-scales).  Both get the reference's /4 scaling here so the
    product carries the 1/16 normalization (droid_net.py:98-99).
    ``coords``: (E, h1, w1, 2) level-0.  Returns (E, h1, w1, L·(2r+1)²) f32.

    vs the materialized path: HBM traffic drops from ~(P² per edge per
    round) volume reads to just the fmaps (the level-0 volume is ~18 MB
    per edge; the fmaps are ~0.8 MB) — the window contraction reuses the
    VMEM-resident volume block straight off the MXU.

    ``prescaled=True``: inputs already carry the /4 scaling and bf16 dtype
    (``corr.corr_feat_pack`` state) — skip the rescale."""
    if prescaled:
        f1 = fmap1.astype(jnp.bfloat16)
        fmap2_pyr = [f.astype(jnp.bfloat16) for f in fmap2_pyr]
    else:
        fmap2_pyr = [
            (f.astype(jnp.float32) / 4.0).astype(jnp.bfloat16)
            for f in fmap2_pyr
        ]
        f1 = (fmap1.astype(jnp.float32) / 4.0).astype(jnp.bfloat16)
    return _corr_fused_call(
        f1, tuple(fmap2_pyr), coords, radius=radius, interpret=interpret,
        row_block=row_block,
    )


@functools.partial(
    jax.jit, static_argnames=("radius", "interpret", "row_block")
)
def _corr_fused_call(f1, fmap2_pyr, coords, radius, interpret, row_block):
    L = len(fmap2_pyr)
    E, h1, w1, C = f1.shape
    k = 2 * radius + 1

    def _vmem_bytes(r):
        P = r * w1
        vol = max(f.shape[1] * f.shape[2] for f in fmap2_pyr) * P * 4
        f2s = sum(f.shape[1] * f.shape[2] * C * 2 for f in fmap2_pyr)
        sel = sum(
            P * k * (f.shape[1] + f.shape[2]) * 4 for f in fmap2_pyr
        )
        t = max(P * k * f.shape[2] * 4 for f in fmap2_pyr)
        return vol + f2s + sel + t + P * (C * 2 + (2 + L * k * k) * 4)

    R = 1
    for cand in (row_block, 8, 4, 2):
        if h1 % cand == 0 and _vmem_bytes(cand) < 8 * 1024 * 1024:
            R = cand
            break

    grid = (E, h1 // R)
    in_specs = [
        pl.BlockSpec(
            (1, R, w1, 2), lambda e, y: (e, y, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, R, w1, C), lambda e, y: (e, y, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    for f in fmap2_pyr:
        h2, w2 = f.shape[1], f.shape[2]
        in_specs.append(
            pl.BlockSpec(
                (1, h2, w2, C), lambda e, y: (e, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
    out_spec = pl.BlockSpec(
        (1, R, w1, L * k * k), lambda e, y: (e, y, 0, 0),
        memory_space=pltpu.VMEM,
    )
    flops = 2 * E * h1 * w1 * sum(
        (C + k) * f.shape[1] * f.shape[2] + k * k * f.shape[2]
        for f in fmap2_pyr
    )
    reads = coords.size * 4 + f1.size * 2 + E * h1 // R * sum(
        f.shape[1] * f.shape[2] * C * 2 for f in fmap2_pyr
    )
    return pl.pallas_call(
        functools.partial(_kernel_fused, radius=radius, levels=L),
        out_shape=jax.ShapeDtypeStruct((E, h1, w1, L * k * k), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=reads + E * h1 * w1 * L * k * k * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(coords, f1, *fmap2_pyr)


def _kernel(coords_ref, *refs, radius: int, levels: int):
    vol_refs = refs[:levels]
    out_ref = refs[levels]
    cr = coords_ref[0]                                   # (R, w1, 2)
    k = 2 * radius + 1
    outs = []
    for lvl in range(levels):
        scale = 1.0 / (2.0 ** lvl)
        u = cr[..., 0] * scale
        v = cr[..., 1] * scale
        vol = vol_refs[lvl][0].astype(jnp.float32)       # (R, w1, h2, w2)
        o = _lookup_level(vol, u, v, radius)
        R, w1 = o.shape[:2]
        outs.append(o.reshape(R, w1, k * k))
    out_ref[0] = jnp.concatenate(outs, axis=-1)


@functools.partial(
    jax.jit, static_argnames=("radius", "interpret", "row_block")
)
def corr_lookup_pyramid_pallas(
    pyramid, coords, radius: int = 3, interpret: bool = False,
    row_block: int = 8,
):
    """Drop-in for ``corr.corr_lookup_pyramid`` (level-major channels).

    pyramid: list of (E, h1, w1, h2_l, w2_l) volumes (bf16 or f32);
    coords:  (E, h1, w1, 2) level-0 (u, v).
    Returns (E, h1, w1, L·(2r+1)²) f32.
    """
    pyramid = tuple(pyramid)
    L = len(pyramid)
    E, h1, w1 = coords.shape[:3]
    k = 2 * radius + 1

    def _vmem_bytes(r):
        # volume blocks (input dtype + in-kernel f32 cast), coords, output,
        # selection matrices and the (P, k, w2) row-contraction transient
        vols = sum(
            r * w1 * v.shape[3] * v.shape[4] * (v.dtype.itemsize + 4)
            for v in pyramid
        )
        sel = sum(
            r * w1 * k * (v.shape[3] + v.shape[4]) * 4 for v in pyramid
        )
        t = max(r * w1 * k * v.shape[4] * 4 for v in pyramid)
        return vols + sel + t + r * w1 * (2 + L * k * k) * 4

    # largest row block that divides h1 AND fits comfortably in VMEM
    # (~16 MB/core; leave half for pipelining/double buffering)
    R = 1
    for cand in (row_block, 8, 4, 2):
        if h1 % cand == 0 and _vmem_bytes(cand) < 8 * 1024 * 1024:
            R = cand
            break

    grid = (E, h1 // R)
    in_specs = [
        pl.BlockSpec(
            (1, R, w1, 2), lambda e, y: (e, y, 0, 0),
            memory_space=pltpu.VMEM,
        )
    ]
    for vol in pyramid:
        h2, w2 = vol.shape[3], vol.shape[4]
        in_specs.append(
            pl.BlockSpec(
                (1, R, w1, h2, w2),
                lambda e, y: (e, y, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
    out_spec = pl.BlockSpec(
        (1, R, w1, L * k * k), lambda e, y: (e, y, 0, 0),
        memory_space=pltpu.VMEM,
    )
    flops = 2 * E * h1 * w1 * k * sum(
        v.shape[3] * v.shape[4] + v.shape[4] * k for v in pyramid
    )
    reads = coords.size * 4 + sum(
        v.size * v.dtype.itemsize for v in pyramid
    )
    return pl.pallas_call(
        functools.partial(_kernel, radius=radius, levels=L),
        out_shape=jax.ShapeDtypeStruct((E, h1, w1, L * k * k), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=reads + E * h1 * w1 * L * k * k * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(coords, *pyramid)
