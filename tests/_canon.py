"""Canonical micro shapes for integration tests (suite re-fit, VERDICT r4
item 6).

Every synthetic_small-based integration test runs in the same pytest
process, and the pipeline's jitted graphs are keyed on static shapes
(points_pad, caps, sample counts) AND static loop counts (TrackParams/
BAParams.num_iterations). Tests that agree on these knobs share one set of
XLA compiles — in-process via the jit cache and across files/runs via the
persistent compile cache (conftest.py). On a fresh 1-core host each
distinct megastep costs minutes of compile, so keeping these aligned is
what lets the default suite fit its wall-clock budget.

Rules:
  - Use CANON verbatim unless the test's POINT is a different shape (cap
    growth / overflow tests) — those pay for their own compiles.
  - n_frames / bootstrap_steps / keyframe_gap / seeds are host-side loop
    counts and decision knobs: vary freely, they never trigger a compile.
  - A test that needs a non-canonical static knob should change ONLY that
    knob so every other graph still hits the cache.
"""

# 8 track / 8 map iterations: enough for stable dm-level tracking on the
# synthetic scenes (test_subscene's measured stability note: 8 iters is the
# smallest stably-converged budget; 5-6 is chaotic under graph-level float
# perturbations for some seeds), cheap enough for CI.
CANON = [
    "tracker_specs.num_iterations=8",
    "mapper_specs.num_iterations=8",
]
