"""Smoke tests for the speed-of-light probe (utils/roofline.py).

Round-3 postmortem: an un-compilable mix kernel (i1 vector planes carried
through fori_loop — Mosaic-illegal) reached the final commit because no
test touched ``measure_mix_rate``/``mix_schedule``.  These tests run the
probe end-to-end in Pallas interpret mode on CPU so a kernel that cannot
trace/execute fails the suite; they do NOT assert timing (CPU-interpret
numbers are not hardware rates).
"""
import pytest

from ray_tracer_fragment_shader_tpu.utils.roofline import (
    _EXTRA_BASIC, _MIX_BLOCK_OPS, _rewrite_schedule, measure_mix_rate,
    mix_schedule)

# an op-class blend shaped like the render kernels' jaxpr counts,
# including every class _emit knows how to generate
RENDER_LIKE = dict(basic=8000.0, select=2000.0, cmp=1200.0, abs=150.0,
                   rsqrt=300.0, sqrt=60.0, recip_nr=220.0, floor=40.0,
                   sign=30.0, div=20.0)


def test_mix_schedule_budget_and_classes():
    sched = mix_schedule(RENDER_LIKE)
    assert len(sched) == _MIX_BLOCK_OPS
    # the dominant classes must all be present
    for cls in ("basic", "select", "cmp", "rsqrt", "recip_nr"):
        assert cls in sched
    # unknown classes fold into basic rather than crash
    sched2 = mix_schedule({"basic": 1.0, "other:weird": 1.0})
    assert set(sched2) == {"basic"}


def test_rewrite_schedule_pays_debt():
    sched, leftover = _rewrite_schedule(("sign", "basic", "basic", "cmp"))
    # sign owes 1 support mul -> one following basic removed
    assert sched == ("sign", "basic", "cmp")
    assert leftover == 0
    # debt with no basic left over is RETURNED, not silently dropped
    sched3, leftover3 = _rewrite_schedule(("basic", "floor"))
    assert leftover3 == _EXTRA_BASIC["floor"]


@pytest.mark.parametrize("counts", [
    RENDER_LIKE,
    {"basic": 1.0},                       # degenerate: single class
    {"sign": 5.0, "floor": 5.0},          # heavy _EXTRA_BASIC debt
])
def test_measure_mix_rate_interpret_smoke(counts):
    # tiny iters/reps: this checks trace+execute, not the rate
    rate = measure_mix_rate(counts, iters=2, reps=1, interpret=True)
    assert rate > 0.0


def test_live_plane_analysis():
    """The jaxpr max-live analyzer (the pressure-model input) produces
    sane plane counts: positive, and the backward's working set larger
    than the forward's (it holds per-level records + cotangent
    accumulators)."""
    from ray_tracer_fragment_shader_tpu.scene import presets
    from ray_tracer_fragment_shader_tpu.utils.opcount import (
        kernel_live_planes, kernel_op_counts)
    scene, _, cfg = presets.full_reflective(size=32, depth=2)
    fwd_live, bwd_live = kernel_live_planes(scene, cfg)
    assert 10 < fwd_live < 1000
    assert bwd_live > fwd_live
    # counts and live numbers come from the same cached trace
    fwd, bwd = kernel_op_counts(scene, cfg)
    assert sum(fwd.values()) > sum(bwd.values()) > 0
