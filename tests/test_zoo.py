"""Weight-registry tests: local checkpoint resolution, torch→flax
conversion caching, and the PriorDA coarse→fine production flip
(reference default: fine refinement, priorda.py:100-161)."""

import functools

import numpy as np
import pytest

from vipe_tpu.models import zoo

from .test_dav2 import make_synthetic_dav2_sd


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_flatten_roundtrip():
    tree = {
        "a": {"b": np.ones((2, 3), np.float32), "c": np.zeros(4)},
        "d": np.arange(5),
    }
    back = zoo.unflatten_tree(zoo.flatten_tree(tree))
    assert set(back) == {"a", "d"}
    np.testing.assert_array_equal(back["a"]["b"], tree["a"]["b"])
    np.testing.assert_array_equal(back["a"]["c"], tree["a"]["c"])
    np.testing.assert_array_equal(back["d"], tree["d"])


def test_absent_weights_return_none(tmp_path, monkeypatch):
    monkeypatch.setenv("VIPE_WEIGHTS_DIR", str(tmp_path))
    assert not zoo.has_weights("droidnet")
    assert zoo.load_params("droidnet") is None


def test_npz_resolution(tmp_path, monkeypatch, rng):
    monkeypatch.setenv("VIPE_WEIGHTS_DIR", str(tmp_path))
    tree = {"layer": {"kernel": rng.normal(size=(3, 4)).astype(np.float32)}}
    np.savez(tmp_path / "droidnet.npz", **zoo.flatten_tree(tree))
    got = zoo.load_params("droidnet")
    np.testing.assert_array_equal(got["layer"]["kernel"],
                                  tree["layer"]["kernel"])


def test_torch_checkpoint_conversion_and_cache(tmp_path, monkeypatch, rng):
    """A reference-shaped torch .pth converts through models/convert.py on
    first load and caches the flax tree as .npz alongside."""
    import torch

    import jax.numpy as jnp

    from vipe_tpu.priors.depth.dav2 import DepthAnythingV2Net

    monkeypatch.setenv("VIPE_WEIGHTS_DIR", str(tmp_path))
    sd = {k: torch.from_numpy(v)
          for k, v in make_synthetic_dav2_sd(rng, cond_dim=3).items()}
    torch.save(sd, tmp_path / "priorda_fine.pth")

    params = zoo.load_params("priorda_fine")
    assert params is not None
    assert (tmp_path / "priorda_fine.npz").exists()  # conversion cached

    # cached npz round-trips to the identical tree
    params2 = zoo.load_params("priorda_fine")
    flat1, flat2 = zoo.flatten_tree(params), zoo.flatten_tree(params2)
    assert set(flat1) == set(flat2)
    for k in flat1:
        np.testing.assert_array_equal(flat1[k], np.asarray(flat2[k]), err_msg=k)

    # the converted tree drives the conditioned net
    net = DepthAnythingV2Net("vits", max_depth=None, params=params,
                             cond_dim=3)
    x = jnp.asarray(rng.random((1, 56, 70, 3)), jnp.float32)
    c = jnp.asarray(rng.random((1, 56, 70, 3)), jnp.float32)
    out = net(x, c)
    assert out.shape == (1, 56, 70)
    assert np.isfinite(np.asarray(out)).all()


def _write_priorda_weights(tmp_path, rng):
    import torch

    for fam, cond in (("priorda", 0), ("priorda_fine", 3)):
        sd = {k: torch.from_numpy(v)
              for k, v in make_synthetic_dav2_sd(rng, cond_dim=cond).items()}
        torch.save(sd, tmp_path / f"{fam}.pth")


def test_priorda_fine_path_with_registry_weights(tmp_path, monkeypatch, rng):
    """With registry weights present, PriorDAModel() runs the reference
    coarse→fine path end-to-end (encoder variant inferred from the
    checkpoint's embed dim)."""
    from vipe_tpu.priors.depth.priorda import PriorDAModel

    monkeypatch.setenv("VIPE_WEIGHTS_DIR", str(tmp_path))
    _write_priorda_weights(tmp_path, rng)

    m = PriorDAModel(input_size=70)
    assert not m.coarse_only
    assert m.net.variant == "vits"       # inferred from weights
    assert m.fine_net.variant == "vits"

    rgb = rng.random((60, 80, 3)).astype(np.float32)
    prompt = np.zeros((60, 80), np.float32)
    prompt[::7, ::9] = 2.0 + rng.random((9, 9)).astype(np.float32)
    depth = m.complete(rgb, prompt)
    assert depth.shape == (60, 80)
    assert np.isfinite(depth).all()
    assert (depth > 0).all()


def test_adaptive_processor_flips_to_fine(tmp_path, monkeypatch, rng):
    """The full.yaml production path: AdaptiveDepthProcessor builds the
    coarse→fine PriorDA when registry weights exist and the SLAM-map
    coverage is high (reference processors.py:245-269)."""
    import vipe_tpu.priors.depth.priorda as priorda_mod
    from vipe_tpu.pipeline.processors import AdaptiveDepthProcessor
    from vipe_tpu.streams.base import VideoFrame

    monkeypatch.setenv("VIPE_WEIGHTS_DIR", str(tmp_path))
    _write_priorda_weights(tmp_path, rng)
    # small inference size for the test (the processor uses the default
    # PriorDAModel construction in production)
    monkeypatch.setattr(
        priorda_mod, "PriorDAModel",
        functools.partial(priorda_mod.PriorDAModel, input_size=70),
    )

    H, W = 48, 64

    class _FakeMap:
        def uv_coverage_score(self, w2c, intr, cam, image_size, frame_idx):
            return 1.0  # high coverage → PriorDA branch

        def project_map(self, w2c, intr, cam, hw, frame_idx):
            prompt = np.zeros(hw, np.float32)
            prompt[::5, ::6] = 2.0
            return prompt

    class _FakeOut:
        trajectory = np.tile(
            np.asarray([0, 0, 0, 0, 0, 0, 1.0], np.float32), (4, 1)
        )
        intrinsics = np.asarray([W, W, W / 2, H / 2], np.float32)
        camera_type = "pinhole"
        slam_map = _FakeMap()

    proc = AdaptiveDepthProcessor("adaptive_constant-2.0",
                                  slam_output=_FakeOut())
    frames = [
        VideoFrame(
            raw_frame_idx=k,
            rgb=rng.random((H, W, 3)).astype(np.float32),
            intrinsics=_FakeOut.intrinsics,
        )
        for k in range(2)
    ]
    out = list(proc.update_iterator(iter(frames)))
    assert len(out) == 2
    assert proc.priorda is not None and not proc.priorda.coarse_only
    for f in out:
        assert f.metric_depth.shape == (H, W)
        assert np.isfinite(f.metric_depth).all()
