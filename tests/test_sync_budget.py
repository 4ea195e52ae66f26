"""Pin the frontend's per-keyframe host-sync budget.

The latency architecture (CLAUDE.md perf notes) guarantees ZERO blocking
per-keyframe device→host fetches on the fused tracking path:

* the keyframe-removal decision readback is deferred/overlapped (depth-2
  speculation);
* the proximity-matrix token is submitted PRE-STEP (``proximity_spec``, on
  by default): enqueued before the fused step on pre-BA state with the
  scratch slot const-velocity-predicted in-program, so its transfer
  completes in the shadow of the step's compute and the readback at the
  next keyframe finds the data already in flight/landed.

A regression that adds a hidden sync per keyframe costs a full tunnel
round-trip (~40 ms) each; these tests count the marked fetch/submit sites
via the VIPE_PROFILE_FG accumulator + frontend counters to catch that
structurally.
"""

import numpy as np
import pytest

import jax

import vipe_tpu.slam.factor_graph as fg
import vipe_tpu.slam.system as sysmod
from vipe_tpu.slam.system import SLAMSystem, make_droidnet_fns

from .test_frontend_deferred import H, W, HT, WD, T, TextureStream


@pytest.fixture(scope="module")
def droid_fns():
    from vipe_tpu.models.droidnet import init_droidnet

    model, params = init_droidnet(jax.random.PRNGKey(0), ht=HT, wd=WD)
    return make_droidnet_fns(model), params


def _run_counted(droid_fns, **extra_cfg):
    (ef, ec, uf), params = droid_fns
    old_flag = fg._PROF_FG
    old_dump = fg._pdump
    fg._PROF_FG = True
    fg._pdump = lambda tag: None  # keep the accumulator for inspection
    fg._prof_acc.clear()
    frontends = []

    class SpyFrontend(sysmod.SLAMFrontend):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            frontends.append(self)

    orig = sysmod.SLAMFrontend
    sysmod.SLAMFrontend = SpyFrontend
    try:
        system = SLAMSystem(
            config=dict(
                resize_area=H * W, filter_thresh=-1.0, keyframe_thresh=0.0,
                warmup=4, buffer=32, infill_chunk_size=6, backend_iters=2,
                **extra_cfg,
            ),
            update_fn=uf, params=params,
            encode_features=ef, encode_context=ec,
        )
        out = system.run(TextureStream())
        acc = dict(fg._prof_acc)
    finally:
        sysmod.SLAMFrontend = orig
        fg._PROF_FG = old_flag
        fg._pdump = old_dump
        fg._prof_acc.clear()
    assert np.isfinite(out.trajectory).all()
    return out, acc, frontends[0]


def test_zero_blocking_fetches_per_keyframe(droid_fns):
    """Default path (proximity_spec=True): every post-warmup keyframe's
    proximity token was submitted PRE-STEP, so no per-keyframe fetch waits
    on the fused step's compute."""
    out, acc, fe = _run_counted(droid_fns)

    n_post_warmup_kf = T - 4  # keyframes tracked after __initialize
    # every post-warmup keyframe submitted its token BEFORE the fused step
    assert fe.n_prestep_submits == n_post_warmup_kf, (
        fe.n_prestep_submits, n_post_warmup_kf, acc
    )
    # proximity reads still happen (token resolution), but never exceed one
    # per keyframe + the backend graph builds
    assert acc.get("prox_fetch_n", 0) <= n_post_warmup_kf + 3, acc
    # removal decisions resolve via the SAME deferred scalar, exactly once
    # per post-warmup keyframe — a second fetch per keyframe would mean the
    # deferral pipeline broke
    assert acc.get("removal_fetch_n", 0) == n_post_warmup_kf, acc


def test_one_proximity_fetch_per_keyframe_exact_mode(droid_fns):
    """proximity_spec=False restores the reference-exact post-step distance
    submission: one blocking proximity fetch per keyframe, zero pre-step."""
    out, acc, fe = _run_counted(droid_fns, proximity_spec=False)

    n_post_warmup_kf = T - 4
    assert fe.n_prestep_submits == 0
    assert acc.get("prox_fetch_n", 0) <= n_post_warmup_kf + 3, acc
    assert acc.get("removal_fetch_n", 0) == n_post_warmup_kf, acc


def test_prox_spec_recovers_trajectory(droid_fns):
    """Speculative (pre-BA-stale) proximity distances still produce a
    finite, complete trajectory with the same keyframe count as exact mode
    (all-keep regime: the decision itself is exact in both)."""
    out_spec, _, fe_spec = _run_counted(droid_fns)
    out_exact, _, fe_exact = _run_counted(droid_fns, proximity_spec=False)
    assert out_spec.trajectory.shape == out_exact.trajectory.shape
    assert fe_spec.t1 == fe_exact.t1
    assert np.isfinite(out_spec.trajectory).all()
