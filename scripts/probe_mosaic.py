"""Empirical Mosaic capability probes for the corr-kernel rework.

Remote-compiles tiny single-op Pallas kernels at the real frontend shapes
(R=8 source rows, w1=64, k=7 window, level-0 volume 48x64) and reports
which constructs Mosaic accepts:

  1. leading-merge reshape   (R, w1, k, h2) -> (R*w1, k, h2)
  2. batched rank-3 dot      (P, k, h2) x (P, h2, w2) -> (P, k, w2)
  3. minor-merge reshape     (R, w1, k, k) -> (R, w1, k*k)
  4. minor-split reshape     (P, h2*w2) -> (P, h2, w2)
  5. 2D matmul + batched dot pipeline end-to-end (the planned kernel body)
"""

import functools
import traceback

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, W1, K, H2, W2, C = 8, 64, 7, 48, 64, 128
P = R * W1


def probe(name, kernel, in_shapes, out_shape):
    try:
        args = [jnp.zeros(s, jnp.float32) for s in in_shapes]
        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        jax.jit(fn).lower(*args).compile()
        print(f"OK   {name}", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"FAIL {name}: {msg}", flush=True)


def k_lead_merge(x_ref, o_ref):
    o_ref[:] = x_ref[:].reshape(P, K, H2)


def k_batched_dot(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def k_minor_merge(x_ref, o_ref):
    o_ref[:] = x_ref[:].reshape(R, W1, K * K)


def k_minor_split(x_ref, o_ref):
    o_ref[:] = x_ref[:].reshape(P, H2, W2)


def k_pipeline(cr_ref, vol_ref, o_ref):
    """Planned kernel body: one-hot selection built at rank 3 + two batched
    dots, no reshapes anywhere."""
    u = cr_ref[:][:, 0:1]          # (P, 1)
    v = cr_ref[:][:, 1:2]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = (u - u0)[:, :, None]      # (P, 1, 1)
    dv = (v - v0)[:, :, None]
    offs = jax.lax.broadcasted_iota(jnp.int32, (1, K, 1), 1) - (K // 2)

    def sel(center, frac, size):
        base = center[:, :, None].astype(jnp.int32) + offs    # (P, K, 1)
        grid = jax.lax.broadcasted_iota(jnp.int32, (1, 1, size), 2)
        one0 = (base == grid).astype(jnp.float32)
        one1 = (base + 1 == grid).astype(jnp.float32)
        return (1.0 - frac) * one0 + frac * one1

    Wy = sel(v0, dv, H2)           # (P, K, H2)
    Wx = sel(u0, du, W2)           # (P, K, W2)
    t = jax.lax.dot_general(
        Wy, vol_ref[:], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                              # (P, K, W2)
    o_ref[:] = jax.lax.dot_general(
        t, Wx, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                              # (P, K, K)


def k_fused_vol(f1_ref, f2_ref, o_ref):
    """Fused-path volume build: plain 2D matmul (P, C) x (C, h2*w2)."""
    o_ref[:] = jax.lax.dot_general(
        f1_ref[:], f2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def main():
    probe("lead_merge", k_lead_merge, [(R, W1, K, H2)], (P, K, H2))
    probe("batched_dot", k_batched_dot, [(P, K, H2), (P, H2, W2)],
          (P, K, W2))
    probe("minor_merge", k_minor_merge, [(R, W1, K, K)], (R, W1, K * K))
    probe("minor_split", k_minor_split, [(P, H2 * W2)], (P, H2, W2))
    probe("pipeline", k_pipeline, [(P, 2), (P, H2, W2)], (P, K, K))
    probe("fused_vol", k_fused_vol, [(P, C), (C, H2 * W2)], (P, H2 * W2))


if __name__ == "__main__":
    main()


def k_vol_rank3(f1_ref, f2_ref, o_ref):
    """(P, C) x (H2, W2, C) -> (P, H2, W2): multi-dim rhs, no batch."""
    o_ref[:] = jax.lax.dot_general(
        f1_ref[:], f2_ref[:], (((1,), (2,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def k_sel_shared(wy_ref, f2_ref, o_ref):
    """(P, K, H2) x (H2, W2C) -> (P, K, W2C): shared rhs, lhs rank 3."""
    o_ref[:] = jax.lax.dot_general(
        wy_ref[:], f2_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def probes2():
    probe("vol_rank3", k_vol_rank3, [(P, C), (H2, W2, C)], (P, H2, W2))
    probe("sel_shared", k_sel_shared, [(P, K, H2), (H2, W2 * C)],
          (P, K, W2 * C))


if __name__ == "__main__" and __import__("os").environ.get("PROBE2"):
    probes2()
