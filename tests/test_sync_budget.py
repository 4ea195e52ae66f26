"""Pin the frontend's per-keyframe host-sync budget.

The latency architecture (CLAUDE.md perf notes) guarantees ONE blocking
device→host fetch per keyframe on the fused tracking path — the
proximity-matrix read in ``add_proximity_factors`` — with the
keyframe-removal decision readback fully deferred/overlapped (depth-2
speculation).  A regression that adds a hidden sync per keyframe costs a
full tunnel round-trip (~40 ms) each; this test counts the marked fetch
sites via the VIPE_PROFILE_FG accumulator to catch that structurally.
"""

import numpy as np
import pytest

import jax

import vipe_tpu.slam.factor_graph as fg
from vipe_tpu.slam.system import SLAMSystem, make_droidnet_fns

from .test_frontend_deferred import H, W, HT, WD, T, TextureStream


@pytest.fixture(scope="module")
def droid_fns():
    from vipe_tpu.models.droidnet import init_droidnet

    model, params = init_droidnet(jax.random.PRNGKey(0), ht=HT, wd=WD)
    return make_droidnet_fns(model), params


def test_one_proximity_fetch_per_keyframe(droid_fns):
    (ef, ec, uf), params = droid_fns
    old_flag = fg._PROF_FG
    old_dump = fg._pdump
    fg._PROF_FG = True
    fg._pdump = lambda tag: None  # keep the accumulator for inspection
    fg._prof_acc.clear()
    try:
        system = SLAMSystem(
            config=dict(
                resize_area=H * W, filter_thresh=-1.0, keyframe_thresh=0.0,
                warmup=4, buffer=32, infill_chunk_size=6, backend_iters=2,
            ),
            update_fn=uf, params=params,
            encode_features=ef, encode_context=ec,
        )
        out = system.run(TextureStream())
        acc = dict(fg._prof_acc)
    finally:
        fg._PROF_FG = old_flag
        fg._pdump = old_dump
        fg._prof_acc.clear()
    assert np.isfinite(out.trajectory).all()

    n_post_warmup_kf = T - 4  # keyframes tracked after __initialize
    # ONE proximity fetch per post-warmup keyframe, plus the backend's
    # graph builds (2 end-of-pass runs at this size) and the warmup init
    # (which goes through add_neighborhood, not proximity)
    assert acc.get("prox_fetch_n", 0) <= n_post_warmup_kf + 3, acc
    # removal decisions resolve via the SAME deferred scalar, exactly once
    # per post-warmup keyframe — a second fetch per keyframe would mean the
    # deferral pipeline broke
    assert acc.get("removal_fetch_n", 0) == n_post_warmup_kf, acc
