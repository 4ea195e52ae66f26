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


def _window_selections(cr, radius: int, scale: float, h2: int, w2: int):
    """Bilinear window one-hot selections built at their FINAL rank.

    Mosaic-legal by construction (probed on v5e): broadcasted_iota +
    comparisons at rank 3, no reshapes anywhere (Mosaic rejects reshapes
    that touch the minor two dims — "unsupported shape cast").

    cr: (P, 2) f32 level-0 coords.  Returns
      Wy  (P, k, h2)  bf16 — row selection (contracted against the bf16
                       volume on the MXU);
      Wx2 (P, k², w2) f32  — column selection at FLAT window index
                       j = dy·k + dx (dx = j mod k);
      R   (P, k², k)  f32  — expansion one-hots R[p, j, dy] = [dy == j//k].

    Why flat: a (P, k, k) output block leaves the minor two vector dims at
    (7, 7), which Mosaic tiles to (8, 128) — an 18× VMEM blowup that OOMs
    the scoped 16 MB budget.  Flattening the window axis to k² = 49 keeps
    the lane dim productive."""
    k = 2 * radius + 1
    kk = k * k
    P = cr.shape[0]
    u = cr[:, 0:1] * scale                              # (P, 1)
    v = cr[:, 1:2] * scale
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = (u - u0)[:, :, None]                           # (P, 1, 1)
    dv = (v - v0)[:, :, None]

    offs_y = jax.lax.broadcasted_iota(jnp.int32, (1, k, 1), 1) - radius
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (1, kk, 1), 1)
    offs_x = j_idx % k - radius

    def sel(center, frac, offs, size):
        base = center[:, :, None].astype(jnp.int32) + offs
        grid = jax.lax.broadcasted_iota(jnp.int32, (1, 1, size), 2)
        one0 = (base == grid).astype(jnp.float32)
        one1 = (base + 1 == grid).astype(jnp.float32)
        return (1.0 - frac) * one0 + frac * one1

    Wy = sel(v0, dv, offs_y, h2).astype(jnp.bfloat16)
    Wx2 = sel(u0, du, offs_x, w2)
    dy_grid = jax.lax.broadcasted_iota(jnp.int32, (1, 1, k), 2)
    R = jnp.broadcast_to(
        (j_idx // k == dy_grid).astype(jnp.float32), (P, kk, k)
    )
    return Wy, Wx2, R


def _flat_window_output(t, Wx2, R):
    """Row-contracted values t (P, k, w2) → flat window output (P, k²).

    t2[p, j, x] = t[p, j//k, x] via the expansion one-hot (a P-batched
    rank-3 dot — probed legal), then the x-selection collapses as an
    elementwise multiply-reduce on the VPU."""
    t2 = jax.lax.dot_general(                           # (P, k², w2)
        R, t, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return jnp.sum(t2 * Wx2, axis=-1)                   # (P, k²)


def _pick_pixel_block(P_all: int, w1: int, row_block: int, vmem_bytes):
    """Largest multiple of w1 that divides h1·w1 and fits the VMEM budget.

    Any divisor is Mosaic-legal: the pixel-indexed arrays are PRE-BLOCKED
    to rank 4 (E, G, Pb, ·) in XLA so every block covers its full minor
    axes ("equal to the respective dimensions" rule) — the 8/128 minor-dim
    divisibility constraint never applies, even at odd operating grids
    like 41×73 (the production ~512×384 /8 resolution)."""
    Pb = w1
    for cand in (row_block * w1, 8 * w1, 4 * w1, 2 * w1):
        if P_all % cand == 0 and vmem_bytes(cand) < 8 * 1024 * 1024:
            Pb = cand
            break
    return Pb


def _kernel_fused(coords_ref, f1_ref, *refs, radius: int, levels: int):
    """altcorr-style fused build+lookup: per pixel block, each level's
    correlation volume is computed ON THE MXU IN VMEM (f1_blk · f2ᵀ) and
    immediately contracted with the bilinear window selection — the volume
    never exists in HBM.  TPU analog of the reference's shared-memory
    ``altcorr_forward`` (/root/reference/csrc/droid_net_ext/
    altcorr_kernel.cu:27-130).

    No reshapes in the body (Mosaic-illegal on minor dims): the volume is
    produced directly at rank 3 by contracting C against the rank-3 f2
    block, and selections are built at final rank."""
    f2_refs = refs[:levels]
    out_refs = refs[levels:]
    cr = coords_ref[0, 0]                                # (P, 2)
    f1 = f1_ref[0, 0]                                    # (P, C) bf16
    P = f1.shape[0]
    k = 2 * radius + 1
    for lvl in range(levels):
        scale = 1.0 / (2.0 ** lvl)
        f2t_ref = f2_refs[lvl]                           # (1, h2, C, w2) bf16
        h2, w2 = f2t_ref.shape[1], f2t_ref.shape[3]
        v = cr[:, 1:2] * scale                           # (P, 1)
        v0 = jnp.floor(v)
        dv = v - v0                                      # (P, 1)
        offs = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1) - radius
        base_y = v0.astype(jnp.int32) + offs             # (P, k)
        _, Wx2, R = _window_selections(cr, radius, scale, h2, w2)

        # Wy·(f1·f2ᵀ) accumulated row-by-row: each target row y costs one
        # (P, C)·(C, w2) MXU matmul + a (P, k, w2) VPU FMA.  Mosaic has no
        # legal way to materialize the (P, h2, w2) volume from a 2D matmul
        # (minor-dim reshapes and rank-2×rank-3 contractions both fail to
        # lower — scripts/probe_mosaic.py), so the y-contraction rides the
        # accumulation instead.
        def body(y, t):
            f2_y = f2t_ref[0, y]                         # (C, w2)
            vol_y = jax.lax.dot_general(                 # (P, w2)
                f1, f2_y, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            wy = ((base_y == y).astype(jnp.float32) * (1.0 - dv)
                  + (base_y + 1 == y).astype(jnp.float32) * dv)  # (P, k)
            return t + wy[:, :, None] * vol_y[:, None, :]

        t = jax.lax.fori_loop(
            0, h2, body, jnp.zeros((P, k, w2), jnp.float32)
        )
        out_refs[lvl][0, 0] = _flat_window_output(t, Wx2, R)


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
    P_all = h1 * w1
    k = 2 * radius + 1

    kk = k * k

    def _vmem_bytes(p):
        # f2 level blocks (shared, double-buffered), f1 block, per-level
        # transients: t (P,k,w2), t2/Wx2 (P,k²,w2), R, padded flat outputs
        f2s = 2 * sum(f.shape[1] * f.shape[2] * C * 2 for f in fmap2_pyr)
        w2m = max(f.shape[2] for f in fmap2_pyr)
        h2s = sum(f.shape[1] for f in fmap2_pyr)
        trans = p * (k * w2m + 2 * kk * w2m + kk * k) * 4
        sel_y = p * k * h2s * 2
        out = p * L * max(kk, 128) * 4
        return f2s + trans + sel_y + out + p * (C * 2 + 2 * 4)

    Pb = _pick_pixel_block(P_all, w1, row_block, _vmem_bytes)
    G = P_all // Pb

    # pixel-indexed arrays PRE-BLOCKED to rank 4: every BlockSpec covers
    # its full minor axes, so Mosaic's 8/128 minor-dim divisibility rule
    # is satisfied by the "equal to the array dimension" clause at ANY
    # operating grid (41×73 included)
    coords_f = coords.reshape(E, G, Pb, 2)
    f1_f = f1.reshape(E, G, Pb, C)
    # per-row (C, w2) layout so the kernel's row matmul contracts C directly
    fmap2_t = tuple(f.transpose(0, 1, 3, 2) for f in fmap2_pyr)

    grid = (E, G)
    in_specs = [
        pl.BlockSpec(
            (1, 1, Pb, 2), lambda e, y: (e, y, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, Pb, C), lambda e, y: (e, y, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    for f in fmap2_t:
        h2, w2 = f.shape[1], f.shape[3]
        in_specs.append(
            pl.BlockSpec(
                (1, h2, C, w2), lambda e, y: (e, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
    # one flat (E, G, Pb, k²) output PER LEVEL (multi-output avoids both the
    # Mosaic-illegal minor-dim concat/reshape and the (7,7) tile blowup);
    # XLA concatenates level-major outside, matching the XLA path's layout
    out_shapes = tuple(
        jax.ShapeDtypeStruct((E, G, Pb, k * k), jnp.float32)
        for _ in range(L)
    )
    out_specs = tuple(
        pl.BlockSpec((1, 1, Pb, k * k), lambda e, y: (e, y, 0, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(L)
    )
    flops = 2 * E * h1 * w1 * sum(
        (C + k) * f.shape[1] * f.shape[2] + k * k * f.shape[2]
        for f in fmap2_pyr
    )
    reads = coords.size * 4 + f1.size * 2 + E * P_all // Pb * sum(
        f.shape[1] * f.shape[2] * C * 2 for f in fmap2_pyr
    )
    outs = pl.pallas_call(
        functools.partial(_kernel_fused, radius=radius, levels=L),
        out_shape=out_shapes,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=reads + E * h1 * w1 * L * k * k * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(coords_f, f1_f, *fmap2_t)
    return jnp.concatenate(
        [o.reshape(E, h1, w1, k * k) for o in outs], axis=-1
    )


def _kernel(coords_ref, *refs, radius: int, levels: int):
    vol_refs = refs[:levels]
    out_refs = refs[levels:]
    cr = coords_ref[0, 0]                                # (P, 2)
    for lvl in range(levels):
        scale = 1.0 / (2.0 ** lvl)
        vol = vol_refs[lvl][0]                           # (P, h2, w2) bf16/int8
        h2, w2 = vol.shape[1], vol.shape[2]
        Wy, Wx2, R = _window_selections(cr, radius, scale, h2, w2)
        if vol.dtype == jnp.int8:
            # int8 quantized volume: dequant convert happens HERE in VMEM
            # (the per-edge scale is folded into the output outside the
            # kernel); int→f32→bf16 keeps the convert on probed-legal paths
            vol = vol.astype(jnp.float32)
        t = jax.lax.dot_general(                         # (P, k, w2)
            Wy, vol.astype(Wy.dtype),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        out_refs[lvl][0, 0] = _flat_window_output(t, Wx2, R)


@functools.partial(
    jax.jit, static_argnames=("radius", "interpret", "row_block")
)
def corr_lookup_pyramid_pallas(
    pyramid, coords, radius: int = 3, interpret: bool = False,
    row_block: int = 8, scales=None,
):
    """Drop-in for ``corr.corr_lookup_pyramid`` (level-major channels).

    pyramid: list of (E, h1, w1, h2_l, w2_l) volumes (bf16, f32 or int8);
    coords:  (E, h1, w1, 2) level-0 (u, v).
    ``scales``: optional per-level tuple of per-edge (E,) dequantization
    factors for int8 volumes (folded into the f32 outputs in XLA — the
    window contraction is linear in the volume).
    Returns (E, h1, w1, L·(2r+1)²) f32.

    Blocks are PIXEL-FLAT: volumes/coords are reshaped (free, in XLA) to
    (E, h1·w1, …) outside the kernel and the kernel body never reshapes —
    Mosaic rejects reshapes touching the minor two dims (probed:
    scripts/probe_mosaic.py), while P-batched rank-3 contractions and
    rank-3 iota/one-hot construction compile fine.
    """
    pyramid = tuple(pyramid)
    L = len(pyramid)
    E, h1, w1 = coords.shape[:3]
    P_all = h1 * w1
    k = 2 * radius + 1

    kk = k * k

    def _vmem_bytes(p):
        # volume blocks (double-buffered), coords, padded flat outputs,
        # bf16 row selections + the (P,k²,·) transients (t2, Wx2, R)
        vols = 2 * sum(
            p * v.shape[3] * v.shape[4] * v.dtype.itemsize for v in pyramid
        )
        w2m = max(v.shape[4] for v in pyramid)
        h2s = sum(v.shape[3] for v in pyramid)
        trans = p * (k * w2m + 2 * kk * w2m + kk * k) * 4
        sel_y = p * k * h2s * 2
        out = p * L * max(kk, 128) * 4
        return vols + trans + sel_y + out + p * 2 * 4

    # largest pixel block that divides h1·w1 AND fits comfortably in VMEM
    # (~16 MB/core; leave half for pipelining/double buffering)
    Pb = _pick_pixel_block(P_all, w1, row_block, _vmem_bytes)
    G = P_all // Pb

    # coords/outputs pre-blocked to rank 4 (see _pick_pixel_block); the
    # volumes stay rank 4 with the pixel block at dim -3, where Mosaic's
    # minor-dim rule doesn't constrain it
    coords_f = coords.reshape(E, G, Pb, 2)
    pyr_f = tuple(
        v.reshape(E, P_all, v.shape[3], v.shape[4]) for v in pyramid
    )

    grid = (E, G)
    in_specs = [
        pl.BlockSpec(
            (1, 1, Pb, 2), lambda e, y: (e, y, 0, 0),
            memory_space=pltpu.VMEM,
        )
    ]
    for vol in pyr_f:
        h2, w2 = vol.shape[2], vol.shape[3]
        in_specs.append(
            pl.BlockSpec(
                (1, Pb, h2, w2),
                lambda e, y: (e, y, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
    # one flat (E, G, Pb, k²) output per level (see _corr_fused_call)
    out_shapes = tuple(
        jax.ShapeDtypeStruct((E, G, Pb, k * k), jnp.float32)
        for _ in range(L)
    )
    out_specs = tuple(
        pl.BlockSpec((1, 1, Pb, k * k), lambda e, y: (e, y, 0, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(L)
    )
    flops = 2 * E * h1 * w1 * k * sum(
        v.shape[3] * v.shape[4] + v.shape[4] * k for v in pyramid
    )
    reads = coords.size * 4 + sum(
        v.size * v.dtype.itemsize for v in pyramid
    )
    outs = pl.pallas_call(
        functools.partial(_kernel, radius=radius, levels=L),
        out_shape=out_shapes,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=reads + E * h1 * w1 * L * k * k * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(coords_f, *pyr_f)
    # level-major channel order, identical to the XLA path's concatenation
    outs = [o.reshape(E, h1, w1, k * k) for o in outs]
    if scales is not None:
        outs = [o * s[:, None, None, None] for o, s in zip(outs, scales)]
    return jnp.concatenate(outs, axis=-1)
