"""Multi-video data-parallel sharding tests (8 virtual CPU devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vipe_tpu.parallel.sharding import host_shard_indices, pvmap, shard_videos, video_mesh


class TestSharding:
    def test_mesh_and_placement(self):
        assert len(jax.devices()) == 8, "conftest must force 8 virtual devices"
        mesh = video_mesh(8)
        x = jnp.zeros((8, 4, 4))
        (xs,) = shard_videos(mesh, (x,))
        assert "video" in str(xs.sharding)

    def test_pvmap_per_video_independent(self, rng):
        mesh = video_mesh(8)
        x = jnp.asarray(rng.random((8, 16)), jnp.float32)
        (xs,) = shard_videos(mesh, (x,))
        f = pvmap(lambda v: v * 2.0 + jnp.sum(v), mesh)
        out = f(xs)
        want = np.asarray(x) * 2 + np.asarray(x).sum(-1, keepdims=True)
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6)

    def test_host_shard_split(self):
        a = host_shard_indices(10, 3, 0)
        b = host_shard_indices(10, 3, 1)
        c = host_shard_indices(10, 3, 2)
        assert sorted(a + b + c) == list(range(10))
        assert not (set(a) & set(b))

    def test_graft_dryrun(self):
        import __graft_entry__ as g

        g.dryrun_multichip(8)
