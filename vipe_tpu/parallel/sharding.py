"""Multi-chip scaling for the annotation engine.

The reference is strictly single-GPU (SURVEY.md §2.6: no torch.distributed /
NCCL anywhere).  The TPU-native scaling story is **video/frame data
parallelism**: each video's SLAM problem fits one chip comfortably
(≤1024 keyframes × 48×64 disp grids), so chips run independent pipelines and
the batched vision priors shard over a ``data`` mesh axis.  This module
provides the mesh plumbing:

  * ``video_mesh(n)`` — 1-D device mesh over a ``video`` axis;
  * ``shard_videos`` — place per-video pytrees along it;
  * ``pvmap`` — vmap a single-video jitted step over the video axis with
    sharding constraints so XLA partitions it 1-video-per-chip (this is what
    ``__graft_entry__.dryrun_multichip`` exercises);
  * ``host_shard_indices`` — the DCN-level work split used by run.py
    (num_shards/shard_id round-robin).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def video_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), axis_names=("video",))


def shard_videos(mesh: Mesh, tree):
    """Place a pytree whose leaves lead with the video/batch axis."""
    sharding = NamedSharding(mesh, P("video"))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


def pvmap(fn, mesh: Mesh):
    """vmap ``fn`` over a leading video axis and constrain the result to stay
    video-sharded; combined with ``shard_videos`` inputs XLA partitions the
    whole computation per-chip with no cross-video collectives."""
    sharding = NamedSharding(mesh, P("video"))

    @functools.wraps(fn)
    def wrapped(*args):
        out = jax.vmap(fn)(*args)
        return jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(x, sharding), out
        )

    return jax.jit(wrapped)


def host_shard_indices(n_items: int, num_shards: int, shard_id: int) -> Sequence[int]:
    """Round-robin multi-host work split (run.py's distributed backend)."""
    return [k for k in range(n_items) if k % num_shards == shard_id]


def shard_prior_batch(mesh: Mesh, forward, params, batch):
    """Batch-parallel vision prior over the mesh (SURVEY §2.6: ICI batch
    sharding for the ViT zoo).

    ``forward(params, batch)`` must be batch-leading and jittable (every
    DepthAnythingV2Net/Metric3DNet/UniDepthNet._forward qualifies).  The
    batch is placed along the mesh axis; XLA partitions the whole network
    per-device with no collectives (pure data parallelism), so N chips
    process N frames per step.
    """
    sharding = NamedSharding(mesh, P("video"))
    batch_sharded = jax.device_put(batch, sharding)

    @jax.jit
    def run(p, x):
        out = forward(p, x)
        return jax.tree_util.tree_map(
            lambda o: jax.lax.with_sharding_constraint(o, sharding), out
        )

    return run(params, batch_sharded)
