"""JAX helpers for in-place device-buffer mutation.

Eager ``arr.at[i].set(v)`` cannot donate its input, so every call copies the
WHOLE array — 1.6 GB per keyframe append for the feature buffers.  These
jitted helpers donate the destination so XLA updates in place (the jit cache
keys on shape/dtype, so each buffer layout compiles once).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, donate_argnums=0)
def _set_row_dyn(arr, val, idx):
    return jax.lax.dynamic_update_slice(
        arr, val[None], (idx,) + (0,) * (arr.ndim - 1)
    )


def set_row(arr, idx, val):
    """In-place ``arr[idx] = val`` (idx dynamic — one trace per shape)."""
    return _set_row_dyn(arr, val.astype(arr.dtype), jnp.int32(idx))


@functools.partial(jax.jit, donate_argnums=0)
def _set_prefix(arr, val):
    return jax.lax.dynamic_update_slice(arr, val.astype(arr.dtype),
                                        (0,) * arr.ndim)


def set_prefix(arr, val):
    """In-place ``arr[:len(val), ...] = val``."""
    return _set_prefix(arr, val)


@functools.partial(jax.jit, donate_argnums=0)
def _set_slice_dyn(arr, val, start):
    return jax.lax.dynamic_update_slice(
        arr, val, (start,) + (0,) * (arr.ndim - 1)
    )


def set_rows(arr, start: int, val):
    """In-place ``arr[start:start+len(val)] = val`` (contiguous rows)."""
    return _set_slice_dyn(arr, val.astype(arr.dtype), jnp.int32(start))


@functools.partial(jax.jit, donate_argnums=0)
def _scatter_rows(arr, idx, val):
    return arr.at[idx].set(val)


def set_rows_at(arr, idx, val):
    """In-place scatter ``arr[idx] = val`` for an index array."""
    return _scatter_rows(arr, jnp.asarray(idx, jnp.int32), val.astype(arr.dtype))


@functools.partial(jax.jit, donate_argnums=0, static_argnums=3)
def _copy_rows_dyn(arr, src, dst, n):
    rows = jax.lax.dynamic_slice(
        arr, (src,) + (0,) * (arr.ndim - 1), (n,) + arr.shape[1:]
    )
    return jax.lax.dynamic_update_slice(
        arr, rows, (dst,) + (0,) * (arr.ndim - 1)
    )


def copy_rows(arr, src: int, dst: int, n: int = 1):
    """In-place ``arr[dst:dst+n] = arr[src:src+n]`` as ONE donated program.

    The gather and the scatter must live in the same dispatch: an eager
    ``arr[src]`` interleaved with a donated update serializes the pipeline
    (measured 3× slower in rm_factors, see CLAUDE.md)."""
    return _copy_rows_dyn(arr, jnp.int32(src), jnp.int32(dst), n)


@functools.partial(jax.jit, donate_argnums=0, static_argnums=3)
def _copy_rows_tree(arrs, src, dst, n):
    def cp(a):
        rows = jax.lax.dynamic_slice(
            a, (src,) + (0,) * (a.ndim - 1), (n,) + a.shape[1:]
        )
        return jax.lax.dynamic_update_slice(
            a, rows, (dst,) + (0,) * (a.ndim - 1)
        )

    return jax.tree.map(cp, arrs)


def copy_rows_tree(arrs, src: int, dst: int, n: int = 1):
    """``arr[dst:dst+n] = arr[src:src+n]`` for EVERY array in the pytree, in
    ONE donated dispatch (vs one program per array, each paying the remote
    tunnel's per-dispatch cost)."""
    return _copy_rows_tree(arrs, jnp.int32(src), jnp.int32(dst), n)


@functools.partial(jax.jit, donate_argnums=0)
def _set_rows_tree(arrs, vals, start):
    def upd(a, v):
        return jax.lax.dynamic_update_slice(
            a, v.astype(a.dtype), (start,) + (0,) * (a.ndim - 1)
        )

    return jax.tree.map(upd, arrs, vals)


def set_rows_tree(arrs, vals, start: int):
    """Write contiguous rows into SEVERAL buffers in ONE donated dispatch.
    ``vals`` mirrors ``arrs``; every value carries a leading rows axis."""
    return _set_rows_tree(arrs, vals, jnp.int32(start))


@functools.partial(jax.jit, donate_argnums=0)
def _permute_rows(arr, perm):
    return arr[perm]


def permute_rows(arr, perm):
    """``arr = arr[perm]`` without a second persistent allocation."""
    return _permute_rows(arr, jnp.asarray(perm, jnp.int32))


@functools.partial(jax.jit, donate_argnums=0)
def _copy_row_between(dst, src, src_row, dst_row):
    row = jax.lax.dynamic_slice(
        src, (src_row,) + (0,) * (src.ndim - 1), (1,) + src.shape[1:]
    )
    return jax.lax.dynamic_update_slice(
        dst, row.astype(dst.dtype), (dst_row,) + (0,) * (dst.ndim - 1)
    )


def copy_row_between(dst, src, src_row: int, dst_row: int):
    """``dst[dst_row] = src[src_row]`` across two arrays as ONE donated
    program (dst donated, src read-only) — an eager ``src[row]`` gather
    interleaved with donated updates serializes the device pipeline."""
    return _copy_row_between(dst, src, jnp.int32(src_row), jnp.int32(dst_row))
