"""End-to-end benchmark: tracked+mapped scans/sec at the KITTI compute budget.

Runs the full SLAM pipeline on a procedural KITTI-like world, on whatever
device JAX provides (the real TPU chip under the driver). Two budgets:

- DEFAULT (the driver's headline row): the SHIPPED tracker config — GN/LM
  with track_gn_iterations=16 (utils/config.py defaults, same as
  configs/kitti/kitti.yaml) + map 25 iterations x 2048 rays + voxel
  insertion + map maintenance per scan. The GN tracker replaced Adam-25 as
  the shipped default in round 2 (docs/PERF.md) because it reaches the same
  pose in fewer, cheaper iterations.
- `--adam25`: the REFERENCE-PARITY tracker budget — 25x2048-ray Adam
  iterations exactly as configs/kitti/kitti.yaml:19-24 +
  /root/reference/src/tracking.py:127 prescribe. Use this row when quoting
  "same per-frame work as the reference" comparisons.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference repo publishes no throughput numbers
(BASELINE.json "published": {}). BASELINE.md "Reference throughput
derivation" derives a structural bound of ~0.1-0.2 scans/s from the
reference's mandatory per-iteration GPU->CPU->GPU embedding-remap hop
(measured 61 ms/iter at tracking scale on this host's CPU,
render_helpers.py:86-87), its 50 sequential optimizer iterations per scan,
and its per-frame pickle publish (measured 360 ms round trip). We keep
1.0 scans/s as the denominator — 5-10x more generous to the reference than
the measured bound — so vs_baseline understates the speedup. The BASELINE
target is >= 5x this denominator.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np

# persistent compile cache: bench re-runs (and later rounds) skip XLA compiles
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFERENCE_SCANS_PER_SEC = 1.0  # documented estimate, see module docstring

BENCH_OVERRIDES = [
    # KITTI-budget knobs on the synthetic world; 150 frames so the timing
    # captures map-growth scaling (refresh/recenter cost vs map size), not
    # just the small-map steady state (VERDICT r1 weak #9)
    "data_specs.n_frames=150",
    "data_specs.max_depth=40.0",
    "data_specs.min_depth=2.0",
    "data_specs.n_beams=64",
    "data_specs.n_azimuth=1024",
    "data_specs.traj_step=1.0",
    "data_specs.yaw_rate=0.004",
    "tracker_specs.N_rays=2048",
    "tracker_specs.num_iterations=25",
    "tracker_specs.step_size=0.2",
    "tracker_specs.learning_rate=0.06",
    "mapper_specs.N_rays_each=2048",
    "mapper_specs.num_iterations=25",
    "mapper_specs.voxel_size=0.4",
    "mapper_specs.step_size=0.5",
    "mapper_specs.keyframe_gap=8",
    "debug_args.mesh_freq=-1",
    "tpu_specs.points_pad=65536",
    "tpu_specs.kf_points_pad=65536",
    "tpu_specs.map_capacity=2097152",  # sized for 150 frames: mid-bench
    #                                     growth would time a re-jit, not
    #                                     the steady pipeline
    "tpu_specs.track_samples=64",
    "tpu_specs.map_samples=48",
    "tpu_specs.bootstrap_steps=4",
    "tpu_specs.region_z_half=12.0",
    "tpu_specs.compute_dtype=bfloat16",
    "tpu_specs.emb_dtype=bfloat16",
    # active budget derived from the measured peak of THIS deterministic
    # bench run: the r5 first parity bench hit n_active 66635 (> the prior
    # 65536, one growth event — /tmp/r5_chip/bench_parity.log). 73728 =
    # 1.11x that peak; the active set is map coverage, insensitive to
    # small numeric shifts, and overflow is lossless since r5 (grow +
    # replay) — a violation costs a timed re-jit and shows up as
    # growth_events > 0 in the JSON, never lost data.
    "tpu_specs.active_cap=73728",
    # reconcile budget, same method: the same run hit touched 16561 >
    # 16384. 20480 = 1.24x measured peak (touched counts wobble more with
    # trajectory numerics than the active set, hence the wider margin).
    # Pinned (not the auto default) so shapes are fixed for the whole
    # timing; kept tight because reconcile/pack cost is O(cap).
    "tpu_specs.touched_cap=20480",
    # the shipped KITTI-class sampler (configs/kitti/kitti.yaml): per-step
    # hit tables; measured 2.06 -> 3.21 scans/s at this budget (r3)
    "tpu_specs.sampler=hits",
    # shipped KITTI lazy-recenter margin: grid rebuild + repack every ~8
    # frames instead of every frame (configs/kitti/kitti.yaml)
    "tpu_specs.recenter_margin=8.0",
]

WARMUP_FRAMES = 6  # compile + first-frame special cases excluded from timing

# `python bench.py --adam25` times the true reference-parity tracker budget
# (Adam, 25 iterations — see module docstring).
ADAM25_OVERRIDES = [
    "tracker_specs.track_method=adam",
    "tracker_specs.num_iterations=25",
]

# `python bench.py --quality` times the SHIPPED quality stack (support
# voxels + band sampling + bias transfer, the configs/kitti defaults) on
# top of the same compute budget; default is the shipped-tracker budget.
QUALITY_OVERRIDES = [
    "tpu_specs.support_dist=-1",
    "tpu_specs.support_sym=true",
    "tpu_specs.band_samples=8",
    "tpu_specs.bias_correction=true",
    # support voxels ~triple the active set and band sampling touches more
    # voxels per step — measured on this row: active hit 65775 and touched
    # overflowed 16384 once (r5 first quality bench, growth_events=2), so
    # both budgets get 2x that headroom to keep mid-bench re-jits out of
    # the timing
    "tpu_specs.active_cap=131072",
    "tpu_specs.touched_cap=32768",
]


def main():
    from nerfloam_tpu.core.pipeline import NerfLoamSLAM
    from nerfloam_tpu.core.frame import Frame
    from nerfloam_tpu.data import get_dataset
    from nerfloam_tpu.utils.config import load_config

    quality = "--quality" in sys.argv
    adam25 = "--adam25" in sys.argv
    # ad-hoc A/B knobs: NERFLOAM_BENCH_SET="group.key=val,group.key=val"
    extra = [s for s in os.environ.get("NERFLOAM_BENCH_SET", "").split(",") if s]
    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "configs", "synthetic",
                     "synthetic_small.yaml"),
        BENCH_OVERRIDES
        + (QUALITY_OVERRIDES if quality else [])
        + (ADAM25_OVERRIDES if adam25 else [])
        + extra,
    )
    dataset = get_dataset(cfg)
    slam = NerfLoamSLAM(cfg, dataset)

    # pre-load all scans so host IO is out of the timed loop
    frames = []
    for i in range(len(dataset)):
        idx, pts, cos, pose = dataset[i]
        frames.append(Frame.from_raw(idx, pts, cos, None, slam.points_pad))

    init_pose = dataset.get_init_pose(0)
    first = frames[0]
    from nerfloam_tpu.core.frame import pose6_from_matrix_np

    first.pose6 = pose6_from_matrix_np(init_pose)
    slam.process_first_frame(first)

    for f in frames[1:WARMUP_FRAMES]:
        slam.process_frame(f)

    import jax

    jax.block_until_ready(slam.state.map_state.embeddings)
    t0 = time.perf_counter()
    n_timed = 0
    for i, f in enumerate(frames[WARMUP_FRAMES:]):
        nxt = WARMUP_FRAMES + i + 1
        if nxt < len(frames):
            frames[nxt].device_arrays()  # overlap upload with device work
        slam.process_frame(f)
        n_timed += 1
    jax.block_until_ready(slam.state.map_state.embeddings)
    dt = time.perf_counter() - t0

    scans_per_sec = n_timed / dt
    result = {
        "metric": "scans_per_sec_kitti_budget"
        + ("_quality" if quality else "")
        + ("_adam25" if adam25 else ""),
        "value": round(scans_per_sec, 3),
        "unit": "scans/s",
        "vs_baseline": round(scans_per_sec / REFERENCE_SCANS_PER_SEC, 3),
        # machine-visible overflow accounting (VERDICT r4 weak #3): any
        # growth_events > 0 means a budget overflowed mid-bench and the
        # timing includes a grow-re-jit + replayed step (lossless, but the
        # caps above were mis-sized); dropped_delta_events must be 0.
        "growth_events": int(sum(slam.overflow_events.values())),
        "overflow_events": {k: int(v) for k, v in slam.overflow_events.items()},
        "dropped_delta_events": int(slam.dropped_delta_events),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
