"""Single-process SLAM orchestration: tracking ∥ mapping as one device program.

Replaces the reference's two-process architecture (/root/reference/src/
nerfloam.py + src/share.py + src/tracking.py:spin + src/mapping.py:spin):
the manager-hosted pickled ShareData, the maxsize-1 frame queue, and the
20-second startup sleep all disappear — tracker and mapper are two jitted
programs sharing device-resident arrays, interleaved deterministically:

  frame 0: create_voxels -> insert_keyframe -> ``bootstrap_steps`` mapping
           calls (the reference spins do_mapping until the tracker wakes,
           mapping.py:100-108 — wall-clock-dependent; ours is a fixed count)
  frame k: track (constant-velocity init) -> do_mapping on the tracked frame
           (selection_method='current', the reference default) ->
           create_voxels -> keyframe-gap check -> trajectory bookkeeping ->
           periodic mesh/pose dumps with optional final_iter random replay.

Keyframe semantics mirror mapping.py exactly: keyframes are box-cropped
copies inserted at ``keyframe_gap`` travel distance; their poses are fixed
after insertion (the reference only optimizes the tracked frame's pose —
random-replay passes update_pose=False); the graph is reset to the current
keyframe after each mesh-interval replay (mapping.py:145-147).

One deliberate deviation: final_iter random windows are *spatially
clustered* (a uniformly random anchor keyframe plus its nearest neighbors)
instead of uniform random subsets, because the dense region grid covers a
local neighborhood; anchors are uniform over keyframes, so replay still
sweeps the whole map.
"""

from __future__ import annotations

import functools
import random as pyrandom
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from nerfloam_tpu.core import ba as ba_mod
from nerfloam_tpu.core import tracking as tr_mod
from nerfloam_tpu.core.frame import Frame
from nerfloam_tpu.map import mesher
from nerfloam_tpu.map import voxel_map as vm
from nerfloam_tpu.models.decoder import init_decoder
from nerfloam_tpu.ops import se3
from nerfloam_tpu.ops.raycast import RaycastConfig
from nerfloam_tpu.utils.config import Config, derive_static_shapes
from nerfloam_tpu.utils.profiler import Profiler

_recenter_refresh_jit = jax.jit(vm.recenter_refresh, static_argnames=("cfg",))
_insert_frame_jit = jax.jit(
    vm.insert_frame, static_argnames=("cfg", "cand_cap", "append_active")
)
_surface_bias_jit = jax.jit(
    ba_mod.surface_bias_at, static_argnames=("map_cfg", "decoder_meta")
)


@functools.partial(jax.jit, static_argnames=("full",))
def _const_vel_jit(last6: jnp.ndarray, prev6: jnp.ndarray, full: bool):
    """Constant-velocity warm start computed ON DEVICE from the raw tracked
    poses of the two previous frames (defer_sync path: the host never sees
    the previous pose before dispatching the next frame). Matches the host
    path exactly: rel = inv(T_prev) @ T_last, init = T_last @ rel; full=False
    propagates translation only (reference tracking.py:113)."""
    t_last = se3.pose_matrix(last6)
    t_prev = se3.pose_matrix(prev6)
    rel = se3.compose_matrices(se3.invert_matrix(t_prev), t_last)
    t_const = se3.compose_matrices(t_last, rel)
    if not full:
        t_const = t_last.at[:3, 3].set(t_const[:3, 3])
    return se3.pose_from_matrix(t_const)


@dataclass
class SlamState:
    """Everything the pipeline owns (checkpointable)."""

    map_state: vm.MapState
    map_cfg: vm.MapConfig
    decoder_params: object
    decoder_meta: object
    keyframes: list = field(default_factory=list)
    current_keyframe: Frame | None = None
    frame_poses: list = field(default_factory=list)   # (kf_idx, rel 4x4)
    final_poses: list = field(default_factory=list)   # accumulated 4x4
    tracking_trajectory: list = field(default_factory=list)  # tracker's own
    #   per-frame 4x4 poses, before any mapper refinement (the reference's
    #   share.py:110-121 push_pose / nerfloam.py:60-63 get_raw_trajectory)
    last_frame: Frame | None = None                   # tracker state
    rel_pose: np.ndarray | None = None                # tracker state
    first_frame_id: int = 0
    frames_processed: int = 0
    frame_telemetry: list = field(default_factory=list)  # per tracked frame:
    #   (index, hit_ratio, track_loss, surface_bias) — divergence forensics
    #   for long runs (the 500-frame replica's seed fragility is suspected
    #   to be occasional tracker divergence; this records the frame it
    #   happens at). Fetched in the existing per-frame sync: zero extra
    #   round trips.
    ba_delta_telemetry: list = field(default_factory=list)  # per tracked
    #   frame: (index, along_m, lat_m, dz_m) — the CURRENT-frame BA step's
    #   pose refinement (BA pose minus tracker pose) in the motion frame.
    #   The estimated trajectory records the BA-refined pose, so any
    #   systematic component here integrates directly into drift — and the
    #   open-loop tracker probes (probe_drift_force) cannot see it (they
    #   run only the tracker). Computed from already-fetched poses: zero
    #   extra round trips.


class NerfLoamSLAM:
    def __init__(self, cfg: Config, dataset, logger=None, profiler=None):
        self.cfg = cfg
        self.dataset = dataset
        self.logger = logger
        self.prof = profiler or Profiler(verbose=bool(cfg.debug_args.get("verbose", False)))
        shapes = derive_static_shapes(cfg)
        self.shapes = shapes

        tpu = cfg.tpu_specs
        self.points_pad = int(tpu["points_pad"])
        self.kf_points_pad = int(tpu["kf_points_pad"])
        # static new-voxel candidate budget for insert compaction: keeps the
        # 8-corner allocation pass at points_pad cost even when support
        # voxels triple the input (insert_points cand_cap; grows on overflow)
        self.insert_cand_cap = (
            int(tpu.get("insert_cand_cap", 0)) or self.points_pad
        )
        self.compute_dtype = tpu["compute_dtype"]

        self.map_cfg = vm.MapConfig(
            capacity=int(tpu["map_capacity"]),
            grid_dim=shapes["grid_dim"],
            voxel_size=shapes["voxel_size"],
            feat_dim=int(cfg.decoder_specs["in_dim"]),
            emb_dtype=tpu["emb_dtype"],
            active_cap=min(int(tpu.get("active_cap", 1 << 18)), int(tpu["map_capacity"])),
            # support_dist < 0 = auto: one voxel (guarantees the next
            # lattice cell past the surface regardless of config)
            support_dist=(
                shapes["voxel_size"]
                if float(tpu.get("support_dist", 0.0)) < 0
                else float(tpu.get("support_dist", 0.0))
            ),
            support_sym=bool(tpu.get("support_sym", False)),
        )

        # occupancy-march spacing: coarse_factor * voxel_size (1.0 default;
        # 0.5 also catches voxels crossed obliquely by short path segments —
        # quality/perf A/B in docs/PERF.md)
        coarse = float(tpu.get("coarse_factor", 1.0)) * shapes["voxel_size"]
        # "hits" = per-step hit table + in-register placement (round-3 hot
        # path, ~3x fewer random gathers per iteration and reference-exact
        # per-voxel-path-length sampling); "grid" = round-2 per-sample grid
        # lookup path (regression fallback)
        sampler = str(tpu.get("sampler", "grid"))
        if sampler not in ("grid", "hits"):
            raise ValueError(
                f"tpu_specs.sampler must be 'grid' or 'hits', got {sampler!r}"
            )
        max_hits = int(tpu.get("max_hits", 20))
        self.rc_track = RaycastConfig(
            step_world=shapes["track_step_world"],
            n_slots=shapes["track_n_slots"],
            n_samples=int(tpu["track_samples"]),
            voxel_size=shapes["voxel_size"],
            max_depth=shapes["max_depth"],
            coarse_step=coarse,
            sampler=sampler,
            max_hits=max_hits,
        )
        self.rc_map = RaycastConfig(
            step_world=shapes["map_step_world"],
            n_slots=shapes["map_n_slots"],
            n_samples=int(tpu["map_samples"]),
            voxel_size=shapes["voxel_size"],
            max_depth=shapes["max_depth"],
            coarse_step=coarse,
            sampler=sampler,
            max_hits=max_hits,
        )

        tspec, mspec, crit = cfg.tracker_specs, cfg.mapper_specs, cfg.criteria
        base_tp = dict(
            n_rays=int(tspec["N_rays"]),
            truncation=float(crit["sdf_truncation"]),
            max_depth=shapes["max_depth"],
            fs_weight=float(crit["fs_weight"]),
            sdf_weight=float(crit["sdf_weight"]),
            compute_dtype=self.compute_dtype,
            resample_rays=bool(tpu.get("track_resample_rays", False)),
            surface_anchor=int(tpu.get("surface_anchor", 0)),
            band_samples=int(tpu.get("band_samples", 0)),
            maturity_warmup=int(tpu.get("maturity_warmup", 0)),
            maturity_floor=float(tpu.get("maturity_floor", 0.25)),
        )
        self.track_method = str(tpu.get("track_method", "adam"))
        if self.track_method not in ("adam", "gn"):
            raise ValueError(
                f"tpu_specs.track_method must be 'adam' or 'gn', "
                f"got {self.track_method!r}"
            )
        self.const_vel_full = bool(tpu.get("const_vel_full", False))
        self.s2s_weight = float(tpu.get("s2s_weight", 0.0))
        if self.s2s_weight > 0 and self.track_method == "gn":
            from nerfloam_tpu.core.scan2scan import Scan2ScanParams

            base_tp["s2s"] = Scan2ScanParams(
                weight=self.s2s_weight,
                n_elev=int(tpu.get("s2s_elev", 64)),
                n_az=int(tpu.get("s2s_az", 1024)),
                gate_dist=float(tpu.get("s2s_gate", 1.0)),
                huber=float(tpu.get("s2s_huber", 0.2)),
                min_depth=float(cfg.data_specs.get("min_depth", 0.5)),
                max_depth=shapes["max_depth"],
            )
        if self.track_method == "gn":
            n_iter = int(tpu.get("track_gn_iterations", 8))
            self.tp = tr_mod.TrackParams(num_iterations=n_iter, **base_tp)
            self.tp_first = tr_mod.TrackParams(num_iterations=n_iter * 2, **base_tp)
            self._track_fn = tr_mod.track_frame_gn
        else:
            n_iter = int(tspec["num_iterations"])
            self.tp = tr_mod.TrackParams(num_iterations=n_iter, **base_tp)
            self.tp_first = tr_mod.TrackParams(num_iterations=n_iter * 5, **base_tp)
            self._track_fn = tr_mod.track_frame
        self.track_lr = float(tspec["learning_rate"])
        # bias transfer (BAResult.surface_bias -> tracking band target):
        # EMA of the mapped field's measured surface offset; 0 disables
        self.bias_correction = bool(tpu.get("bias_correction", False))
        # where the offset is measured: "window" = the BA window's points on
        # the post-BA field (round-2 behavior; reads the overfit transient),
        # "keyframe" = the current keyframe's cloud (settled geometry — what
        # the next tracked frame actually sees; ba.surface_bias_at)
        self.bias_source = str(tpu.get("bias_source", "window"))
        if self.bias_source not in ("window", "keyframe"):
            raise ValueError(
                f"tpu_specs.bias_source must be 'window' or 'keyframe', "
                f"got {self.bias_source!r}"
            )
        # 1 = pooled target (shipped); 2 = separate ground / non-ground
        # targets from the settled keyframe probe (ba.surface_bias_at)
        self.bias_classes = int(tpu.get("bias_classes", 1))
        if self.bias_classes == 2 and self.bias_source != "keyframe":
            raise ValueError(
                "tpu_specs.bias_classes=2 requires bias_source='keyframe' "
                "(the window probe is pooled; its per-class split was "
                "measured worse — docs/PERF.md round-2)"
            )
        self.sdf_bias = np.zeros(2, np.float32)  # [ground, non-ground]
        # device-resident constants (uploading a scalar per frame costs a
        # host round trip on remote-device links)
        self._lr_track_hi = jnp.asarray(self.track_lr * 2, jnp.float32)
        self._lr_track_lo = jnp.asarray(self.track_lr / 3, jnp.float32)

        # touched_cap: the BA delta-reconcile compaction budget, O(cap)
        # scatter cost per step. The current-frame step (hot, every frame)
        # and the replay-window step (cold: replay_freq / mesh intervals /
        # finalize; W frames x 2x rays) have ~10x different touched
        # footprints (EVAL_r04 autocap500: replay steps touched 15-17k where
        # current-frame steps touch ~2-8k), so they get SEPARATE caps —
        # a replay overflow must not permanently inflate the hot path's
        # reconcile. Overflow is lossless either way: the step is replayed
        # from its pre-dispatch state at the grown cap (_retry_ba_touched /
        # _mega_finalize), so auto sizing can never corrupt the map — it
        # only costs a re-jit per growth.
        acap_v = vm.acap(self.map_cfg)
        tc = int(tpu.get("touched_cap", 0))
        if tc > 0:  # explicit: pin both (bench runs pin to fix shapes)
            tc_cur = tc_rand = min(tc, acap_v)
        else:  # auto: floors from the r4 chip measurements above
            tc_cur = min(acap_v, 8192)
            tc_rand = min(acap_v, 32768)
        base_bp = dict(
            truncation=float(crit["sdf_truncation"]),
            max_depth=shapes["max_depth"],
            fs_weight=float(crit["fs_weight"]),
            sdf_weight=float(crit["sdf_weight"]),
            compute_dtype=self.compute_dtype,
            exact_embedding_grads=bool(tpu.get("exact_embedding_grads", False)),
            ray_superset=int(tpu.get("ba_ray_superset", 2)),
            reconcile_mode=str(tpu.get("reconcile_mode", "mean")),
            surface_anchor=int(tpu.get("surface_anchor", 0)),
            band_samples=int(tpu.get("band_samples", 0)),
            # skip the per-BA-step field probe when nothing consumes it
            # (also when the settled keyframe probe replaces it)
            measure_bias=(
                bool(tpu.get("bias_correction", False))
                and self.bias_source == "window"
            ),
        )
        self.bp_current = ba_mod.BAParams(
            n_frames=1,
            n_rays=int(mspec["N_rays_each"]),
            num_iterations=int(mspec["num_iterations"]),
            touched_cap=tc_cur,
            **base_bp,
        )
        self.window_size = int(mspec["window_size"])
        self.bp_random = ba_mod.BAParams(
            n_frames=self.window_size,
            n_rays=int(mspec["N_rays_each"]) * 2,  # mapping.py:187
            num_iterations=int(mspec["num_iterations"]),
            touched_cap=tc_rand,
            **base_bp,
        )
        self.ba_lrs = np.asarray(
            [
                float(mspec["learning_rate_emb"]),
                float(mspec["learning_rate_decorder"]),
                float(mspec["learning_rate_pose"]),
            ],
            np.float32,
        )
        self._ba_lrs_dev = jnp.asarray(self.ba_lrs)
        self.freeze_frame = int(mspec["freeze_frame"])
        self.keyframe_gap = float(mspec["keyframe_gap"])
        self.key_distance = float(mspec["key_distance"])
        self.remove_back = bool(mspec.get("remove_back", False))
        self.final_iter = bool(mspec.get("final_iter", False))
        self.mesh_res = int(mspec.get("mesh_res", 2))
        self.mesh_freq = int(cfg.debug_args.get("mesh_freq", -1))
        # periodic random keyframe-window replay independent of meshing.
        # The reference's mapper replays continuously whenever the tracker
        # is slower than mapping (mapping.py:100-108); our deterministic
        # interleave otherwise only replays at mesh intervals / finalize.
        # Replay re-pins old regions to keyframe-epoch geometry, which
        # counteracts the per-frame re-training of visible surfaces at the
        # current (drifting) pose — see docs/PERF.md vertical-sink section.
        self.replay_freq = int(tpu.get("replay_freq", 0))
        # lazy recentering (vm.maybe_recenter_refresh): >0 skips the
        # per-frame grid rebuild + full repack while the sensor stays within
        # this many meters of the region center; inserts then maintain the
        # active set incrementally (insert append_active). 0 = rebuild every
        # frame (round-2 behavior). Must satisfy
        # region half-extent >= max_depth + margin (validated below).
        self.recenter_margin = float(tpu.get("recenter_margin", 0.0))
        if self.recenter_margin > 0:
            half_xy = min(shapes["grid_dim"][0], shapes["grid_dim"][1]) \
                * shapes["voxel_size"] / 2
            slack = half_xy - shapes["max_depth"]
            if self.recenter_margin > slack:
                raise ValueError(
                    f"tpu_specs.recenter_margin={self.recenter_margin} "
                    f"exceeds region slack {slack:.1f} m "
                    f"(half-extent {half_xy:.1f} - max_depth "
                    f"{shapes['max_depth']:.1f}); rays would leave the grid"
                )
        # real periodic checkpointing (the reference read ckpt_freq but never
        # called its checkpoint writer, loggers.py:36-49 / mapping.py:44)
        self.ckpt_freq = int(cfg.debug_args.get("ckpt_freq", -1))
        self.save_data_freq = int(cfg.debug_args.get("save_data_freq", -1))
        self.bootstrap_steps = int(cfg.tpu_specs["bootstrap_steps"])

        # defer_sync: depth-1 dispatch pipeline over the megastep hot path.
        # Dispatch frame N, then fetch frame N-1's results while the device
        # computes N — the host link latency and bookkeeping fully overlap
        # device compute (the next frame is already queued when the fetch
        # starts). Host decisions that consumed the fetched pose (keyframe
        # insertion, bias EMA, remove_back direction, lazy recenter) lag one
        # frame; the constant-velocity warm start moves on device
        # (_const_vel_jit). Overflow detection also lags one frame: the rare
        # detect-grow-retry replays the in-flight frame from its saved
        # pre-dispatch state (_mega_finalize).
        self.defer_sync = bool(tpu.get("defer_sync", False))
        self.ba_pose_project = str(tpu.get("ba_pose_project", "none"))
        self._inflight = None        # in-flight dispatch record (dict)
        self._dev_last_pose6 = None  # raw tracked pose, last dispatched frame
        self._dev_prev_pose6 = None  # ... and the frame before it
        self._defer_replays = 0      # times the rewind+replay path ran
        self._pending_ba = None      # last BA call's pre-state + args (the
        #   lossless touched-overflow retry rewinds to it, _retry_ba_touched)
        # machine-visible overflow accounting (bench.py / eval_replica.py
        # report these; a CI gate asserts dropped_delta_events == 0):
        # every class is handled by grow + REPLAY from pre-overflow state,
        # so growth costs a re-jit + one replayed step but never data.
        self.overflow_events = {
            "capacity": 0, "active": 0, "touched": 0, "cand": 0,
        }
        self.dropped_delta_events = 0  # steps whose deltas were actually
        #   lost (retry exhausted) — must stay 0; > 0 is a defect

        self._mega_cache = {}
        # multi-chip: rays dp-sharded over a device mesh, map/decoder
        # replicated, grads psum'd (ba.make_sharded_ba_step). dp=1 keeps the
        # fused single-dispatch megastep.
        self.dp = int(tpu.get("dp", 1))
        self.mesh = None
        self._sharded_cache = {}
        if self.dp > 1:
            devs = jax.devices()
            if len(devs) < self.dp:
                raise ValueError(
                    f"tpu_specs.dp={self.dp} but only {len(devs)} devices"
                )
            from jax.sharding import Mesh

            self.mesh = Mesh(np.asarray(devs[: self.dp]), ("dp",))
        self.key = jax.random.key(int(cfg.tpu_specs["seed"]))
        self.pyrng = pyrandom.Random(int(cfg.tpu_specs["seed"]))

        dec_params, dec_meta = init_decoder(
            self._next_key(),
            depth=int(cfg.decoder_specs["depth"]),
            width=int(cfg.decoder_specs["width"]),
            in_dim=int(cfg.decoder_specs["in_dim"]),
            skips=tuple(cfg.decoder_specs.get("skips", []) or []),
            embedder=cfg.decoder_specs.get("embedder", "none"),
            multires=int(cfg.decoder_specs.get("multires", 0)),
        )
        self.state = SlamState(
            map_state=vm.create(self.map_cfg),
            map_cfg=self.map_cfg,
            decoder_params=dec_params,
            decoder_meta=dec_meta,
        )

    # ------------------------------------------------------------------ util

    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    def _pad_for_ba(self, frames: list[Frame], n_frames: int, pad: int):
        """Stack frames into static (W, P, ...) DEVICE buffers.

        Point buffers come from each frame's one-time device upload
        (Frame.device_arrays) and are stacked on device — the host link
        only carries the small pose/flag block."""
        W = n_frames
        devs = [f.device_arrays() for f in frames[:W]]
        for d in devs:
            assert d[0].shape[0] == pad, (d[0].shape, pad)
        while len(devs) < W:  # inactive slots reuse slot 0 (masked out)
            devs.append(devs[0])
        pts = jnp.stack([d[0] for d in devs])
        cos = jnp.stack([d[1] for d in devs])
        val = jnp.stack([d[2] for d in devs])
        poses = np.zeros((W, 6), np.float32)
        active = np.zeros((W,), bool)
        for i, f in enumerate(frames[:W]):
            poses[i] = f.pose6
            active[i] = True
        return pts, cos, val, poses, active

    # ----------------------------------------------------------------- mapper

    def _recenter(self, center_world, refresh: bool = True):
        if refresh:
            # one fused dispatch: recenter + packed-table rebuild, amortized
            # over the ~50 tracker+mapper iterations that consume it
            self.state.map_state = _recenter_refresh_jit(
                self.state.map_state, self.map_cfg,
                jnp.asarray(center_world, jnp.float32),
            )
        else:
            self.state.map_state = vm.recenter(
                self.state.map_state, self.map_cfg,
                jnp.asarray(center_world, jnp.float32),
            )

    def create_voxels(self, frame: Frame, pose_dev=None, check_overflow=True):
        """World-transform (on device) + insert, with capacity-growth retry
        (mapping.py:283-291 + the dynamic embedding growth it triggers).

        ``pose_dev``: optional device (6,) pose (e.g. the BA-refined pose
        still on device) so the transform needs no host round trip.
        ``check_overflow=False`` defers the num_lat fetch to the caller's
        end-of-frame sync (call :meth:`check_map_overflow` after)."""
        pts_d, cos_d, val = frame.device_arrays()
        p6 = pose_dev if pose_dev is not None else jnp.asarray(frame.pose6)
        self.state.map_state = _insert_frame_jit(
            self.state.map_state, self.map_cfg, pts_d, cos_d, val, p6,
            self.insert_cand_cap, self.recenter_margin > 0,
        )
        self._pending_insert = (pts_d, cos_d, val, p6)
        if check_overflow:
            self.check_map_overflow()
            self.check_cand_overflow(int(self.state.map_state.num_cand))

    def check_map_overflow(self, num_lat: int | None = None):
        """Grow x2 and re-run the last insert while over capacity.

        ``num_lat``: pass the row count if already fetched (end-of-frame
        combined sync) to avoid an extra device round trip."""
        if num_lat is not None and num_lat <= self.map_cfg.capacity:
            return
        while vm.overflowed(self.state.map_state, self.map_cfg):
            new_cap = self.map_cfg.capacity * 2
            print(f"[map] capacity exhausted; growing to {new_cap}")
            self.overflow_events["capacity"] += 1
            self.state.map_state, self.map_cfg = vm.grow(
                self.state.map_state, self.map_cfg, new_cap
            )
            self.state.map_cfg = self.map_cfg
            pts, cos, val, p6 = self._pending_insert
            self.state.map_state = _insert_frame_jit(
                self.state.map_state, self.map_cfg, pts, cos, val, p6,
                self.insert_cand_cap, self.recenter_margin > 0,
            )

    def check_cand_overflow(self, num_cand: int):
        """Grow the insert candidate budget and re-run the last insert when
        compaction dropped candidates (insert_points cand_cap docstring).
        Insert is idempotent over already-allocated voxels, so the re-run
        only adds the dropped ones."""
        if num_cand <= self.insert_cand_cap:
            return
        cap = self.insert_cand_cap
        while num_cand > cap:
            cap *= 2
        print(
            f"[map] insert candidates {num_cand} > cand_cap "
            f"{self.insert_cand_cap}; growing to {cap} and re-running insert"
        )
        self.overflow_events["cand"] += 1
        self.insert_cand_cap = cap
        self._mega_cache.clear()  # cand_cap is baked into the megastep
        pts, cos, val, p6 = self._pending_insert
        self.state.map_state = _insert_frame_jit(
            self.state.map_state, self.map_cfg, pts, cos, val, p6,
            self.insert_cand_cap, self.recenter_margin > 0,
        )
        self.check_map_overflow()

    def check_active_overflow(self, n_active: int):
        """Grow active_cap when the active surface set outgrew it (the
        reference's octree had no such cap — octree.cpp:51-111 allocates
        unboundedly — so silent truncation would be a parity break: voxels
        past the cap would stop rendering). Costs one re-jit per growth."""
        if n_active <= vm.acap(self.map_cfg):
            return
        new_acap = vm.acap(self.map_cfg)
        while n_active > new_acap:
            new_acap *= 2
        new_acap = min(new_acap, self.map_cfg.capacity)
        print(
            f"[map] active set overflow ({n_active} > "
            f"{vm.acap(self.map_cfg)}); growing active_cap to {new_acap}"
        )
        self.overflow_events["active"] += 1
        self.map_cfg = self.map_cfg._replace(active_cap=new_acap)
        self.state.map_cfg = self.map_cfg
        # touched_cap only ever needs to cover what one BA step samples —
        # growing the active set does not increase that, so keep the
        # right-sized cap (clamped to the new acap); touched overflow has
        # its own lossless grow-and-replay path (_retry_ba_touched /
        # _mega_finalize)
        self.bp_current = self.bp_current._replace(
            touched_cap=min(self.bp_current.touched_cap, new_acap)
        )
        self.bp_random = self.bp_random._replace(
            touched_cap=min(self.bp_random.touched_cap, new_acap)
        )
        self._mega_cache.clear()  # bp_current is baked into the megastep
        self.state.map_state = vm.refresh_active(self.state.map_state, self.map_cfg)

    @staticmethod
    def _pooled_bias(surface_bias) -> float:
        """Count-weighted pooled value of a (2,2) [biases; counts] probe
        (scalar probes pass through)."""
        arr = np.asarray(surface_bias, np.float64)
        if arr.ndim == 0:
            return float(arr)
        b, c = arr[0], arr[1]
        tot = c.sum()
        return float((b * c).sum() / tot) if tot > 0 else float("nan")

    def _update_sdf_bias(self, surface_bias):
        """EMA the measured surface offset(s) into the tracking band target
        (bias transfer; BAResult.surface_bias / ba.surface_bias_at).

        ``self.sdf_bias`` is (2,) [ground, non-ground]. bias_classes=1
        (default, shipped behavior): both entries track the count-pooled
        mean — identical to the old scalar EMA. bias_classes=2 (keyframe
        probe only): per-class EMA; a class with zero valid samples this
        frame keeps its previous estimate."""
        if not self.bias_correction:
            return
        arr = np.asarray(surface_bias, np.float64)
        if self.bias_classes == 2 and arr.ndim == 2:
            b, c = arr[0], arr[1]
            upd = (c > 0) & np.isfinite(b)
            self.sdf_bias = np.where(
                upd, 0.8 * self.sdf_bias + 0.2 * b, self.sdf_bias
            ).astype(np.float32)
        else:
            sb = self._pooled_bias(surface_bias)
            if np.isfinite(sb):
                self.sdf_bias = (
                    0.8 * self.sdf_bias + 0.2 * sb
                ).astype(np.float32)

    def _grow_touched_cap(self, touched_count: int, which: str = "current") -> bool:
        """Grow the reconcile budget of ONE step class ("current" |
        "random") to cover ``touched_count`` (no re-run — callers rewind and
        replay the overflowed BA step, losslessly). The classes have ~10x
        different touched footprints, so growth never couples them."""
        bp = self.bp_current if which == "current" else self.bp_random
        cap = bp.touched_cap
        if touched_count <= cap:
            return False
        new_cap = cap
        while touched_count > new_cap:
            new_cap *= 2
        new_cap = min(new_cap, vm.acap(self.map_cfg))
        print(
            f"[map] BA({which}) touched {touched_count} voxels > "
            f"touched_cap {cap}; growing to {new_cap} and re-running the "
            f"step (lossless)"
        )
        self.overflow_events["touched"] += 1
        if which == "current":
            self.bp_current = self.bp_current._replace(touched_cap=new_cap)
            self._mega_cache.clear()  # bp_current is baked into the megastep
        else:
            self.bp_random = self.bp_random._replace(touched_cap=new_cap)
        return True

    def _grow_budgets(self, num_lat: int, n_active: int, touched: int,
                      num_cand: int) -> bool:
        """Grow every static budget the fetched counts overflowed — WITHOUT
        re-running anything. Callers (the megastep retry loop) rewind
        ``state.map_state`` to the overflowed step's pre-dispatch state
        first, call this, then replay the step, so no overflow class ever
        loses data. Mutates ``state.map_state`` shapes to match the grown
        config (capacity copy / active-set rebuild)."""
        grew = False
        if num_lat > self.map_cfg.capacity:
            new_cap = self.map_cfg.capacity
            while num_lat > new_cap:
                new_cap *= 2
            print(f"[map] capacity exhausted; growing to {new_cap}")
            self.overflow_events["capacity"] += 1
            self.state.map_state, self.map_cfg = vm.grow(
                self.state.map_state, self.map_cfg, new_cap
            )
            self.state.map_cfg = self.map_cfg
            grew = True
        if n_active > vm.acap(self.map_cfg):
            new_acap = vm.acap(self.map_cfg)
            while n_active > new_acap:
                new_acap *= 2
            new_acap = min(new_acap, self.map_cfg.capacity)
            print(
                f"[map] active set overflow ({n_active} > "
                f"{vm.acap(self.map_cfg)}); growing active_cap to {new_acap}"
            )
            self.overflow_events["active"] += 1
            self.map_cfg = self.map_cfg._replace(active_cap=new_acap)
            self.state.map_cfg = self.map_cfg
            # resize the active-set views to the new cap (the replayed step
            # consumes them at the grown static shape)
            self.state.map_state = vm.refresh_active(
                self.state.map_state, self.map_cfg
            )
            grew = True
        if self._grow_touched_cap(touched):
            grew = True
        if num_cand > self.insert_cand_cap:
            cap = self.insert_cand_cap
            while num_cand > cap:
                cap *= 2
            print(
                f"[map] insert candidates {num_cand} > cand_cap "
                f"{self.insert_cand_cap}; growing to {cap}"
            )
            self.overflow_events["cand"] += 1
            self.insert_cand_cap = cap
            grew = True
        if grew:
            self._mega_cache.clear()  # bp/cand_cap are baked into megasteps
        return grew

    def _retry_ba_touched(self, touched_count: int):
        """Lossless touched-overflow retry for do_mapping-driven BA steps
        (bootstrap, replay windows, the staged frame path): rewind to the
        call's pre-BA state, grow the reconcile budget, and re-run the BA
        step with the SAME RNG key. BA is deterministic in its inputs and
        touched_cap only affects the final reconcile, so the replay
        reproduces the step exactly — now with every delta folded in.
        Returns the new BAResult, or None if no overflow."""
        pb = self._pending_ba
        if pb is None or touched_count <= pb["bp"].touched_cap:
            return None
        self._grow_touched_cap(touched_count, pb["which"])
        grown = (self.bp_current if pb["which"] == "current"
                 else self.bp_random)
        bp = pb["bp"]._replace(touched_cap=grown.touched_cap)
        st = self.state
        st.map_state = pb["pre_map_state"]
        st.decoder_params = pb["pre_decoder_params"]
        res = self._ba_call(bp, st.map_state, st.decoder_params,
                            st.decoder_meta, *pb["args"], pb["key"])
        st.map_state = st.map_state._replace(
            embeddings=res.embeddings, packed=res.packed,
            upd_count=res.upd_count,
        )
        st.decoder_params = res.decoder_params
        return res

    def insert_keyframe(self, frame: Frame):
        kf = frame.cropped(self.key_distance, self.kf_points_pad)
        if kf.n_points < 2 * self.bp_current.n_rays:
            raise ValueError("valid_distance too small")  # mapping.py:277-278
        self.state.current_keyframe = kf
        self.state.keyframes.append(kf)

    def do_mapping(self, tracked_frame: Frame | None, update_pose=True,
                   update_decoder=True, selection_method="current",
                   poses_dev=None, defer_pose_fetch=False):
        """One BA step. ``poses_dev``: optional device (W,6) poses (e.g. the
        tracker's output, never fetched); ``defer_pose_fetch=True`` leaves
        the refined poses on device (returned in the BAResult) for the
        caller's combined end-of-frame sync."""
        st = self.state
        if selection_method == "current":
            assert tracked_frame is not None
            targets = [tracked_frame]
            bp = self.bp_current
            pad = self.points_pad
        elif selection_method in ("random", "previous"):
            targets = (
                self._select_random_window()
                if selection_method == "random"
                else self._select_previous_window()
            )
            bp = self.bp_random
            pad = self.kf_points_pad
            if not targets:
                return None, []
        else:
            raise NotImplementedError(selection_method)

        pts, cos, val, poses, active = self._pad_for_ba(targets, bp.n_frames, pad)
        pose_free = np.array(
            [update_pose and f.index != st.first_frame_id for f in targets]
            + [False] * (bp.n_frames - len(targets))
        )
        ba_args = (
            poses_dev if poses_dev is not None else jnp.asarray(poses),
            pts, cos, val,
            jnp.asarray(active), jnp.asarray(pose_free),
            jnp.asarray(bool(update_decoder)),
            self._ba_lrs_dev,
        )
        key = self._next_key()
        # pre-state + args for the lossless touched-overflow retry
        # (_retry_ba_touched); BA mutates only embeddings/packed/decoder,
        # so the saved map_state reference IS the rewind point
        self._pending_ba = {
            "bp": bp,
            "which": "current" if selection_method == "current" else "random",
            "pre_map_state": st.map_state,
            "pre_decoder_params": st.decoder_params,
            "args": ba_args,
            "key": key,
        }
        res = self._ba_call(
            bp, st.map_state, st.decoder_params, st.decoder_meta,
            *ba_args, key,
        )
        st.map_state = st.map_state._replace(
            embeddings=res.embeddings, packed=res.packed,
            upd_count=res.upd_count,
        )
        st.decoder_params = res.decoder_params
        if not defer_pose_fetch:
            poses_np, touched_np = jax.device_get(
                (res.poses, res.touched_count)
            )
            res2 = self._retry_ba_touched(int(touched_np))
            if res2 is not None:
                res = res2  # poses are bitwise identical (see retry doc)
            self._pending_ba = None  # release the rewind generation
            self._apply_ba_poses(targets, pose_free, np.asarray(poses_np))
        return res, [(targets, pose_free)]

    def _ba_call(self, bp, map_state, dec_params, dec_meta, poses, pts, cos,
                 val, active, pose_free, update_decoder, lrs, key):
        """One BA step: single-chip jit, or the production shard_map step
        over the dp mesh (same body, same sample set — ba.make_sharded_ba_step)."""
        if self.dp == 1:
            return ba_mod.ba_step(
                map_state, self.map_cfg, self.rc_map, bp, dec_params, dec_meta,
                poses, pts, cos, val, active, pose_free, update_decoder,
                lrs, key,
            )
        cache_key = (self.map_cfg, bp)
        fn = self._sharded_cache.get(cache_key)
        if fn is None:
            fn = ba_mod.make_sharded_ba_step(
                self.mesh, self.map_cfg, self.rc_map, bp, dec_meta
            )
            self._sharded_cache[cache_key] = fn
        return fn(map_state, dec_params, poses, pts, cos, val, active,
                  pose_free, update_decoder, lrs, key)

    @staticmethod
    def _apply_ba_poses(targets, pose_free, new_poses: np.ndarray):
        for i, f in enumerate(targets):
            if pose_free[i]:
                f.pose6 = new_poses[i]

    def _record_ba_delta(self, frame: Frame, mapper_frame: Frame,
                         prev_pose6: np.ndarray):
        """Telemetry: the current-frame BA step's pose refinement (mapper
        pose minus tracker pose), decomposed in the motion frame
        (along-track from the previous frame's translation, lateral =
        up x fwd, dz = world z). See SlamState.ba_delta_telemetry. Under
        tpu_specs.ba_pose_project="along" the BA optimizer itself projects
        the along component out of every pose update (ba._ba_core proj_dir
        — it must happen in-optimizer, per iteration, or the embeddings
        co-adapt with the shifted pose and the map inherits the drift), so
        this telemetry's along column doubles as the gate's validation
        signal: it should read ~0 when the gate is on."""
        d = mapper_frame.pose6[:3].astype(np.float64) - frame.pose6[:3]
        m = frame.pose6[:3].astype(np.float64) - prev_pose6[:3]
        n = np.linalg.norm(m)
        if n < 1e-9:
            fwd = np.zeros(3)
            lat = np.zeros(3)
        else:
            fwd = m / n
            lat = np.cross([0.0, 0.0, 1.0], fwd)
            lat /= np.linalg.norm(lat) + 1e-12
        self.state.ba_delta_telemetry.append(
            (frame.index, float(d @ fwd), float(d @ lat), float(d[2]))
        )

    def _select_previous_window(self) -> list[Frame]:
        """The last window_size keyframes (mapping.py:218-219 'previous').
        Like 'random', this is a keyframe-replay window here: the tracked
        frame is always optimized by the per-frame 'current' step, so it is
        not appended to replay windows."""
        kfs = self.state.keyframes
        return kfs[-self.window_size:] if kfs else []

    def _select_random_window(self) -> list[Frame]:
        kfs = self.state.keyframes
        if not kfs:
            return []
        w = self.window_size
        if len(kfs) <= w:
            return kfs[:]
        anchor = self.pyrng.randrange(len(kfs))
        a_t = kfs[anchor].pose6[:3]
        order = sorted(
            range(len(kfs)), key=lambda i: float(np.linalg.norm(kfs[i].pose6[:3] - a_t))
        )
        return [kfs[i] for i in order[:w]]

    # ---------------------------------------------------------------- tracker

    def track_dispatch(self, frame: Frame) -> tr_mod.TrackResult:
        """Dispatch the jitted tracking loop; result stays on device.
        The miss fallback to the constant-velocity pose lives inside the
        jit (core/tracking.py), so no mid-frame host sync is needed."""
        st = self.state
        last = st.last_frame
        last_T = last.pose_matrix()
        const_T = last_T.copy()
        if st.rel_pose is not None:
            if self.const_vel_full:
                # full SE(3) constant-velocity warm start (rotation too) —
                # helps curved trajectories; the reference propagates only
                # translation (tracking.py:113)
                const_T = last_T @ st.rel_pose
            else:
                const_T[:3, 3] = (last_T @ st.rel_pose)[:3, 3]
        from nerfloam_tpu.core.frame import pose6_from_matrix_np
        init6 = pose6_from_matrix_np(const_T)

        first = st.rel_pose is None
        tp = self.tp_first if first else self.tp
        # render_helpers.py:448-450 lr schedule
        lr = self._lr_track_hi if st.frames_processed < 2 else self._lr_track_lo

        pts_d, cos_d, val_d = frame.device_arrays()
        return self._track_fn(
            st.map_state, self.map_cfg, self.rc_track, tp,
            st.decoder_params, st.decoder_meta,
            jnp.asarray(init6), pts_d, cos_d, val_d, lr, self._next_key(),
            jnp.asarray(
                self.sdf_bias if self.bias_correction else 0.0, jnp.float32
            ),
        )

    def track_finalize(self, frame: Frame, pose_np: np.ndarray, hits: int):
        """Host bookkeeping once the tracked pose is fetched."""
        st = self.state
        frame.pose6 = np.asarray(pose_np, np.float32)
        if hits > 0:
            frame.hit_ratio = hits / self.tp.n_rays
        st.tracking_trajectory.append(frame.pose_matrix())
        st.rel_pose = np.linalg.inv(st.last_frame.pose_matrix()) @ frame.pose_matrix()
        frame.rel_pose = st.rel_pose
        st.last_frame = frame
        return frame

    def track(self, frame: Frame) -> Frame:
        """Synchronous track (first frame / standalone use)."""
        res = self.track_dispatch(frame)
        pose_np, hits_np = jax.device_get((res.pose, res.hit_count))
        return self.track_finalize(frame, pose_np, int(hits_np))

    # --------------------------------------------------------------- pipeline

    def process_first_frame(self, frame: Frame):
        st = self.state
        st.first_frame_id = frame.index
        st.last_frame = frame
        st.tracking_trajectory.append(frame.pose_matrix())
        # insert before the first refresh so bootstrap BA sees the voxels
        self._recenter(frame.pose6[:3], refresh=False)
        self.create_voxels(frame)
        self.state.map_state = vm.refresh_active(self.state.map_state, self.map_cfg)
        self.insert_keyframe(frame)
        mapper_frame = self._mapper_copy(frame)
        for _ in range(self.bootstrap_steps):
            self.do_mapping(mapper_frame, selection_method="current")
        self._record_trajectory(mapper_frame)
        st.frames_processed += 1

    def _mapper_copy(self, frame: Frame) -> Frame:
        """The reference pickles frames across the process boundary; the
        mapper's pose refinements never reach the tracker. Keep that
        isolation with an explicit copy."""
        return Frame(
            frame.index, frame.points, frame.points_cos, frame.valid,
            frame.n_points, frame.pose6.copy(), frame.rel_pose,
            frame.has_gt_pose, frame.hit_ratio,
            frame._dev,  # point buffers are immutable: share the upload
        )

    def _record_trajectory(self, mapped_frame: Frame):
        st = self.state
        ref = st.current_keyframe
        rel = np.linalg.inv(ref.pose_matrix()) @ mapped_frame.pose_matrix()
        st.frame_poses.append((len(st.keyframes) - 1, rel))

    def _megastep_for(self, tp):
        """One dispatch for the tracked-frame hot path:
        track -> recenter+refresh_active -> BA(current frame) -> insert.
        The inner functions are themselves jitted and inline here; fusing
        them removes ~4 per-frame dispatch round trips over the host link.

        dp == 1: plain jit. dp > 1 (GN tracker): the SAME body under
        shard_map over the dp mesh — tracking rays and BA rays are
        dp-sharded by global-draw-then-slice inside _track_gn_core /
        _ba_core (map/decoder/optimizer state replicated, normal equations
        and gradients psum'd over ICI), and the map-maintenance stages run
        replicated. The whole frame stays ONE dispatch + ONE sync.
        Cached per (map_cfg, TrackParams) — capacity growth rebuilds it."""
        ba_proj = self.ba_pose_project == "along"
        cache_key = (self.map_cfg, tp, self.insert_cand_cap, ba_proj)
        hit = self._mega_cache.get(cache_key)
        if hit is not None:
            return hit
        map_cfg, rc_t, rc_m, bp = self.map_cfg, self.rc_track, self.rc_map, \
            self.bp_current
        dec_meta = self.state.decoder_meta
        track_fn = self._track_fn
        track_method = self.track_method
        cand_cap = self.insert_cand_cap
        kf_bias = self.bias_correction and self.bias_source == "keyframe"
        max_depth = self.rc_map.max_depth
        margin = self.recenter_margin

        use_s2s = track_method == "gn" and tp.s2s is not None

        def make_body(axis_name, dp):
            def mega(map_state, decoder_params, init6, lr, pts, cos, val_t,
                     val_m, pose_free, update_decoder, ba_lrs, k_track, k_ba,
                     sdf_bias, kf_pts, kf_cos, kf_val, kf_pose6, prev_pts,
                     prev_val, prev_pose6):
                if track_method == "gn":
                    if use_s2s:
                        # rasterize the previous scan once per frame
                        # (replicated under dp — two scatters)
                        from nerfloam_tpu.core.scan2scan import build_prev_scan

                        prev = build_prev_scan(
                            tp.s2s, prev_pts, prev_val, prev_pose6
                        )
                    else:
                        prev = None
                    tr = tr_mod._track_gn_core(
                        axis_name, dp, map_state, map_cfg, rc_t, tp,
                        decoder_params, dec_meta, init6, pts, cos, val_t,
                        lr, k_track, sdf_bias, prev,
                    )
                else:
                    tr = track_fn(
                        map_state, map_cfg, rc_t, tp, decoder_params,
                        dec_meta, init6, pts, cos, val_t, lr, k_track,
                        sdf_bias,
                    )
                if margin > 0:
                    st = vm.maybe_recenter_refresh(
                        map_state, map_cfg, tr.pose[:3], margin
                    )
                else:
                    st = vm.recenter_refresh(map_state, map_cfg, tr.pose[:3])
                if ba_proj:
                    # degeneracy gate (tpu_specs.ba_pose_project="along"):
                    # the BA pose update may not move along the tracked
                    # motion direction — the weak-observability axis (r5
                    # gain probe; ba_delta telemetry attributed +0.37 of
                    # the +0.62 cm/f closed-loop along drift to this
                    # refinement). Zero direction (first frame / rest) =
                    # projection off for that frame.
                    mvec = tr.pose[:3] - prev_pose6[:3]
                    n = jnp.linalg.norm(mvec)
                    fwd = jnp.where(
                        n > 1e-6, mvec / jnp.maximum(n, 1e-9), jnp.zeros(3)
                    )
                    proj = fwd[None]
                else:
                    proj = None
                ba = ba_mod._ba_core(
                    axis_name, dp, st, map_cfg, rc_m, bp, decoder_params,
                    dec_meta, tr.pose[None], pts[None], cos[None],
                    val_m[None], jnp.ones((1,), jnp.bool_), pose_free,
                    update_decoder, ba_lrs, k_ba, proj_dir=proj,
                )
                st = st._replace(embeddings=ba.embeddings, packed=ba.packed,
                                 upd_count=ba.upd_count)
                if kf_bias:
                    # settled-bias probe on the current keyframe's cloud
                    # (ba.surface_bias_at) — replaces the window probe
                    surf_bias = ba_mod.surface_bias_at(
                        st, map_cfg, ba.decoder_params, dec_meta, kf_pose6,
                        kf_pts, kf_val, max_depth, points_cos=kf_cos,
                    )
                else:
                    # pooled window probe -> the same (2, 2) [biases; counts]
                    # layout as the per-class probe
                    surf_bias = jnp.stack([
                        jnp.stack([ba.surface_bias, ba.surface_bias]),
                        jnp.ones((2,), jnp.float32),
                    ])
                st = vm.insert_frame(
                    st, map_cfg, pts, cos, val_m, ba.poses[0], cand_cap,
                    append_active=margin > 0,
                )
                return (st, tr.pose, tr.hit_count, ba.poses,
                        ba.decoder_params, ba.touched_count, surf_bias,
                        tr.loss)
            return mega

        if self.dp == 1:
            mega = jax.jit(make_body(None, 1))
        else:
            from jax.sharding import PartitionSpec as P

            for n, lbl in ((tp.n_rays, "tracker"), (bp.n_rays, "mapper")):
                if n % self.dp != 0:
                    raise ValueError(
                        f"{lbl} N_rays {n} not divisible by dp {self.dp}"
                    )
            mega = jax.jit(jax.shard_map(
                make_body("dp", self.dp), mesh=self.mesh,
                in_specs=P(), out_specs=P(), check_vma=False,
            ))
        self._mega_cache[cache_key] = mega
        return mega

    def process_frame(self, frame: Frame):
        """One tracked frame through the full tracker->mapper interleave.

        The whole frame is dispatched asynchronously — track, recenter +
        active refresh, BA, voxel insertion — and the host syncs ONCE at
        the end (poses + hit count + row counts). Over the remote-device
        link every sync costs ~27 ms, so this is a large fraction of the
        frame budget; the reference paid the analogous cost as two pickle
        hops per frame (share.py)."""
        st = self.state
        mapper_frame = self._mapper_copy(frame)
        if self.remove_back:
            # needs the tracked rel_pose direction: use the previous frame's
            # (one-frame lag; the reference used the current one, but the
            # motion direction changes slowly at scan rate)
            mapper_frame = mapper_frame.without_back_points(self.key_distance)
        update_decoder = (
            mapper_frame.index - st.first_frame_id
        ) < self.freeze_frame

        if not frame.has_gt_pose and (self.dp == 1 or self.track_method == "gn"):
            # hot path: ONE fused dispatch + ONE sync for the whole frame
            # (dp > 1: the same body under shard_map — see _megastep_for).
            # defer_sync: dispatch this frame, then finalize the PREVIOUS
            # frame while the device computes — the fetch latency and host
            # bookkeeping overlap device compute entirely.
            rec = self._mega_dispatch(frame, mapper_frame, update_decoder)
            if self.defer_sync:
                prev_rec, self._inflight = self._inflight, rec
                if prev_rec is not None:
                    self._mega_finalize(prev_rec)
            else:
                self._mega_finalize(rec)
            return
        self._drain()  # staged frames need the frame loop caught up
        # staged path: GT poses (mapping-only), or tracked frames under
        # dp with the Adam tracker (only the GN tracker is dp-sharded)
        track_res = None
        if frame.has_gt_pose:
            pose_dev = jnp.asarray(frame.pose6)
        else:
            with self.prof.section("track"):
                track_res = self.track_dispatch(frame)
            pose_dev = track_res.pose
        with self.prof.section("recenter"):
            self._recenter(pose_dev[:3])
        with self.prof.section("do_mapping"):
            ba_res, ba_meta = self.do_mapping(
                mapper_frame, update_pose=True,
                update_decoder=update_decoder,
                poses_dev=pose_dev[None], defer_pose_fetch=True,
            )
        if self.bias_correction and self.bias_source == "keyframe":
            kf = st.current_keyframe
            kf_pts, kf_cos, kf_val = kf.device_arrays()
            bias_dev = _surface_bias_jit(
                st.map_state, self.map_cfg, st.decoder_params,
                st.decoder_meta, jnp.asarray(kf.pose6), kf_pts, kf_val,
                self.rc_map.max_depth, points_cos=kf_cos,
            )
        else:
            bias_dev = ba_res.surface_bias
        with self.prof.section("create_voxels"):
            self.create_voxels(
                mapper_frame, pose_dev=ba_res.poses[0],
                check_overflow=False,
            )
        with self.prof.section("sync"):
            got = jax.device_get(
                [ba_res.poses, st.map_state.num_lat,
                 st.map_state.n_active, ba_res.touched_count,
                 bias_dev, st.map_state.num_cand]
                + ([track_res.pose, track_res.hit_count, track_res.loss]
                   if track_res is not None else [])
            )
            if track_res is not None:
                prev6_np = st.last_frame.pose6.copy()
                self.track_finalize(frame, got[6], int(got[7]))
                mapper_frame.pose6 = np.asarray(got[6], np.float32)
                st.frame_telemetry.append((
                    frame.index, int(got[7]) / self.tp.n_rays,
                    float(got[8]), self._pooled_bias(got[4]),
                ))
            else:
                # maintain tracker motion state on the GT path too so
                # remove_back direction and a later switch to tracked
                # mode use fresh motion (reference keeps rel_pose per
                # frame, tracking.py:142)
                st.rel_pose = (
                    np.linalg.inv(st.last_frame.pose_matrix())
                    @ frame.pose_matrix()
                )
                frame.rel_pose = st.rel_pose
                mapper_frame.rel_pose = st.rel_pose
                st.last_frame = frame
                st.tracking_trajectory.append(frame.pose_matrix())
            for targets, pose_free in ba_meta:
                self._apply_ba_poses(targets, pose_free, np.asarray(got[0]))
            if track_res is not None and ba_meta and ba_meta[0][1][0]:
                self._record_ba_delta(frame, mapper_frame, prev6_np)
            res2 = self._retry_ba_touched(int(got[3]))
            if res2 is not None:
                # the rewind erased this frame's voxel insert — re-run it on
                # the retried (lossless) state. Poses and the structural
                # counters are deterministic across the retry (touched_cap
                # only changes the reconcile), so the already-fetched
                # num_lat / n_active / num_cand stay valid; only the field
                # changed, so re-measure the bias probe on it.
                ba_res = res2
                self.create_voxels(
                    mapper_frame, pose_dev=ba_res.poses[0],
                    check_overflow=False,
                )
                if self.bias_correction and self.bias_source == "keyframe":
                    kf = st.current_keyframe
                    kf_pts, kf_cos, kf_val = kf.device_arrays()
                    bias_dev = _surface_bias_jit(
                        st.map_state, self.map_cfg, st.decoder_params,
                        st.decoder_meta, jnp.asarray(kf.pose6), kf_pts,
                        kf_val, self.rc_map.max_depth, points_cos=kf_cos,
                    )
                else:
                    bias_dev = ba_res.surface_bias
                got[4] = jax.device_get(bias_dev)
            self._pending_ba = None
            self.check_map_overflow(int(got[1]))
            self.check_active_overflow(int(got[2]))
            self._update_sdf_bias(got[4])
            self.check_cand_overflow(int(got[5]))
        self._post_frame(frame, mapper_frame)

    def _mega_dispatch(self, frame: Frame, mapper_frame: Frame,
                       update_decoder: bool) -> dict:
        """Dispatch one tracked frame's megastep asynchronously; return the
        dispatch record (consumed by :meth:`_mega_finalize`). In defer_sync
        mode the constant-velocity warm start is computed on device
        (_const_vel_jit) so the previous frame's pose never has to reach the
        host before this dispatch."""
        st = self.state
        with self.prof.section("megastep"):
            last = st.last_frame
            first = st.rel_pose is None and self._dev_last_pose6 is None
            if self.defer_sync:
                if first:
                    init6 = jnp.asarray(last.pose6, jnp.float32)
                    prev_pose6_dev = init6
                else:
                    dev_last = self._dev_last_pose6
                    dev_prev = self._dev_prev_pose6
                    if dev_last is None:
                        # seed from host state (resume / GT->tracked switch)
                        from nerfloam_tpu.core.frame import pose6_from_matrix_np

                        dev_last = jnp.asarray(last.pose6, jnp.float32)
                        t_prev = last.pose_matrix() @ np.linalg.inv(st.rel_pose)
                        dev_prev = jnp.asarray(
                            pose6_from_matrix_np(t_prev), jnp.float32
                        )
                    init6 = _const_vel_jit(
                        dev_last, dev_prev, self.const_vel_full
                    )
                    prev_pose6_dev = dev_last
            else:
                last_T = last.pose_matrix()
                const_T = last_T.copy()
                if st.rel_pose is not None:
                    if self.const_vel_full:
                        const_T = last_T @ st.rel_pose
                    else:
                        const_T[:3, 3] = (last_T @ st.rel_pose)[:3, 3]
                from nerfloam_tpu.core.frame import pose6_from_matrix_np

                init6 = jnp.asarray(pose6_from_matrix_np(const_T))
                prev_pose6_dev = jnp.asarray(last.pose6)
            tp = self.tp_first if first else self.tp
            # effective frame count at dispatch time: frames_processed lags
            # by one while a frame is in flight (lr schedule parity,
            # render_helpers.py:448-450)
            eff = st.frames_processed + (1 if self._inflight is not None else 0)
            lr = self._lr_track_hi if eff < 2 else self._lr_track_lo
            pts_d, cos_d, val_t = frame.device_arrays()
            val_m = (
                mapper_frame.device_arrays()[2]
                if self.remove_back
                else val_t
            )
            pose_free = np.array([frame.index != st.first_frame_id])
            kf = st.current_keyframe
            kf_pts, kf_cos, kf_val = kf.device_arrays()
            prev_pts, _, prev_val = last.device_arrays()
            rec = {
                "frame": frame,
                "mapper_frame": mapper_frame,
                "prev_frame": last,
                "tp": tp,
                "pose_free": pose_free,
                "pre_map_state": st.map_state,
                "pre_decoder_params": st.decoder_params,
                "run_args": (
                    init6, lr, pts_d, cos_d, val_t, val_m,
                    jnp.asarray(pose_free), jnp.asarray(bool(update_decoder)),
                    self._next_key(), self._next_key(),
                    jnp.asarray(
                        self.sdf_bias if self.bias_correction
                        else np.zeros(2, np.float32),
                        jnp.float32,
                    ),
                    kf_pts, kf_cos, kf_val, jnp.asarray(kf.pose6),
                    prev_pts, prev_val, prev_pose6_dev,
                ),
            }
            self._mega_run(rec)
            # tracker chain state advances at dispatch so the next frame can
            # dispatch without waiting for this one's fetch
            st.last_frame = frame
        return rec

    def _mega_run(self, rec: dict):
        """Invoke the megastep for a dispatch record (also used by the
        overflow replay path) and stash its device output handles."""
        st = self.state
        (init6, lr, pts_d, cos_d, val_t, val_m, pose_free_d, upd_dec_d,
         k_track, k_ba, sdf_bias_d, kf_pts, kf_cos, kf_val, kf_pose6,
         prev_pts, prev_val, prev_pose6) = rec["run_args"]
        mega = self._megastep_for(rec["tp"])
        (new_state, tpose, thits, ba_poses, dec_params,
         touched_count, surf_bias, track_loss) = mega(
            st.map_state, st.decoder_params, init6, lr,
            pts_d, cos_d, val_t, val_m, pose_free_d, upd_dec_d,
            self._ba_lrs_dev, k_track, k_ba, sdf_bias_d,
            kf_pts, kf_cos, kf_val, kf_pose6,
            prev_pts, prev_val, prev_pose6,
        )
        st.map_state = new_state
        st.decoder_params = dec_params
        rec["pending_insert"] = (pts_d, cos_d, val_m, ba_poses[0])
        self._pending_insert = rec["pending_insert"]
        rec["outs"] = (
            tpose, thits, ba_poses, new_state.num_lat, new_state.n_active,
            touched_count, surf_bias, new_state.num_cand, track_loss,
        )
        if self.defer_sync:
            # device pose recurrence for the next const-velocity init
            self._dev_prev_pose6 = prev_pose6
            self._dev_last_pose6 = tpose

    def _mega_finalize(self, rec: dict):
        """Fetch a dispatched frame's results and run all host bookkeeping
        (tracker state, telemetry, bias EMA, overflow handling, keyframe /
        trajectory / mesh / checkpoint logic)."""
        st = self.state
        frame, mapper_frame = rec["frame"], rec["mapper_frame"]
        with self.prof.section("sync"):
            got = jax.device_get(rec["outs"])
        # -- lossless overflow handling FIRST (r5: every overflow class is
        # grow + REPLAY, never drop): rewind THIS frame to its pre-dispatch
        # state, grow the overflowed budgets, and re-run the whole megastep
        # with the same RNG keys — the replay reproduces the frame exactly,
        # except at the grown shapes (and, when active_cap grew, with the
        # voxels the truncated active set had hidden). A newer in-flight
        # dispatch consumed the overflowed state, so it is replayed on top
        # afterwards. Bookkeeping below must see the FINAL outs.
        num_lat, n_active = int(got[3]), int(got[4])
        touched, num_cand = int(got[5]), int(got[7])

        def _over():
            return (
                num_lat > self.map_cfg.capacity
                or n_active > vm.acap(self.map_cfg)
                or touched > self.bp_current.touched_cap
                or num_cand > self.insert_cand_cap
            )

        if _over():
            newer = self._inflight if self._inflight is not rec else None
            for _ in range(8):  # each round at least doubles a budget
                st.map_state = rec["pre_map_state"]
                st.decoder_params = rec["pre_decoder_params"]
                self._grow_budgets(num_lat, n_active, touched, num_cand)
                rec["pre_map_state"] = st.map_state  # grown rewind point
                self._mega_run(rec)
                got = jax.device_get(rec["outs"])
                num_lat, n_active = int(got[3]), int(got[4])
                touched, num_cand = int(got[5]), int(got[7])
                if not _over():
                    break
            if _over():  # can't happen: counts are bounded by ray budgets
                self.dropped_delta_events += 1
                print(
                    "[map] WARNING: overflow retry exhausted "
                    f"(lat {num_lat} act {n_active} touch {touched} "
                    f"cand {num_cand}); this frame's over-budget results "
                    "were dropped"
                )
            if newer is not None:
                newer["pre_map_state"] = st.map_state
                newer["pre_decoder_params"] = st.decoder_params
                self._mega_run(newer)
                self._defer_replays += 1
        # tracker bookkeeping (track_finalize semantics; st.last_frame was
        # already advanced at dispatch)
        frame.pose6 = np.asarray(got[0], np.float32)
        hits = int(got[1])
        if hits > 0:
            frame.hit_ratio = hits / self.tp.n_rays
        st.tracking_trajectory.append(frame.pose_matrix())
        st.rel_pose = (
            np.linalg.inv(rec["prev_frame"].pose_matrix())
            @ frame.pose_matrix()
        )
        frame.rel_pose = st.rel_pose
        st.frame_telemetry.append((
            frame.index, hits / self.tp.n_rays,
            float(got[8]), self._pooled_bias(got[6]),
        ))
        # mapper copy keeps its isolation; tracked base + BA refine
        mapper_frame.pose6 = frame.pose6
        if rec["pose_free"][0]:
            mapper_frame.pose6 = np.asarray(got[2][0], np.float32)
            self._record_ba_delta(frame, mapper_frame,
                                  rec["prev_frame"].pose6)
        self._update_sdf_bias(got[6])
        # release the pre-dispatch generation so its buffers free
        rec["pre_map_state"] = rec["pre_decoder_params"] = None
        self._post_frame(frame, mapper_frame)

    def _drain(self):
        """Finalize any in-flight deferred frame (defer_sync). Called before
        host operations that need the frame loop caught up: staged-path
        frames, checkpoints, meshes, finalize()."""
        rec, self._inflight = self._inflight, None
        if rec is not None:
            self._mega_finalize(rec)

    def _post_frame(self, frame: Frame, mapper_frame: Frame):
        """Per-frame host logic after the frame's results are on host:
        keyframe-gap insertion, periodic replay, trajectory bookkeeping,
        periodic mesh / checkpoint / debug dumps."""
        st = self.state
        gap = np.linalg.norm(
            mapper_frame.pose6[:3] - st.current_keyframe.pose6[:3]
        )
        if gap > self.keyframe_gap:
            self.insert_keyframe(mapper_frame)

        # record BEFORE the replay block: draining there finalizes the
        # in-flight frame, whose _post_frame records ITS trajectory entry —
        # this frame's entry must precede it
        self._record_trajectory(mapper_frame)

        if (self.replay_freq > 0 and len(st.keyframes) > 1
                and st.frames_processed % self.replay_freq == 0):
            with self.prof.section("replay"):
                # finalize the in-flight frame first: a replay step wedged
                # between two in-flight dispatches would be erased by the
                # lossless overflow rewind (_mega_finalize), silently losing
                # its BA refinement (r4 weak #7). The replay syncs for its
                # poses anyway, so this adds no extra round trip.
                self._drain()
                self._replay(1)
                # replay recenters to a random keyframe; restore the live
                # region around the vehicle for the next frame's tracker
                self._recenter(mapper_frame.pose6[:3])

        if self.mesh_freq > 0 and frame.index % self.mesh_freq == 0:
            self._drain()  # mesh/poses reflect a caught-up frame loop
            self._mesh_interval(mapper_frame)
        if (self.ckpt_freq > 0 and self.logger is not None
                and frame.index % self.ckpt_freq == 0):
            self._drain()  # checkpoints must be self-consistent for resume
            from nerfloam_tpu.utils.checkpoint import save_checkpoint
            import os as _os
            save_checkpoint(
                _os.path.join(self.logger.dir, "ckpt", f"{frame.index:05d}"),
                self,
            )
        if (self.save_data_freq > 0 and self.logger is not None
                and frame.index % self.save_data_freq == 0):
            # debug blob (mapping.py:148-149 / loggers.py:73-75 equivalent)
            self.logger.log_debug_data(
                {
                    "frame_index": frame.index,
                    "pose6": np.asarray(mapper_frame.pose6),
                    "num_lat": int(st.map_state.num_lat),
                    "n_active": int(st.map_state.n_active),
                    "n_keyframes": len(st.keyframes),
                },
                frame.index,
            )
        st.frames_processed += 1

    def _replay(self, n_calls: int):
        for _ in range(n_calls):
            kfs = self.state.keyframes
            if kfs:
                self._recenter(kfs[self.pyrng.randrange(len(kfs))].pose6[:3])
            self.do_mapping(None, update_pose=False, update_decoder=False,
                            selection_method="random")

    def _mesh_interval(self, frame: Frame):
        st = self.state
        did_replay = False
        if self.final_iter and len(st.keyframes) > 20:
            self._replay(len(st.keyframes) + 1)
            did_replay = True
        if self.logger is not None:
            v, f = self.extract_mesh()
            self.logger.log_mesh(v, f, name=f"mesh_{frame.index:05d}.ply")
            self.logger.log_numpy_data(
                np.asarray(self.get_updated_poses()), f"frame_poses_{frame.index:05d}"
            )
        if did_replay:  # graph reset (mapping.py:145-147)
            st.keyframes = [st.current_keyframe]

    def get_updated_poses(self):
        """Flush frame_poses into final_poses (mapping.py:341-351)."""
        st = self.state
        for kf_idx, rel in st.frame_poses:
            ref = st.keyframes[kf_idx] if kf_idx < len(st.keyframes) else st.current_keyframe
            st.final_poses.append(ref.pose_matrix() @ rel)
        st.frame_poses = []
        return st.final_poses

    def observed_points(self, downsample: float = 0.05) -> np.ndarray:
        """World-frame observed surface points from the keyframe clouds
        (the culling source for clean_mesh; the reference used every 5th
        raw frame's depth points, mesh_util.py:46-77 — keyframes are this
        framework's retained equivalent)."""
        clouds = []
        for kf in self.state.keyframes:
            pts = kf.points[kf.valid]
            T = kf.pose_matrix()
            clouds.append(pts @ T[:3, :3].T + T[:3, 3])
        if not clouds:
            return np.zeros((0, 3), np.float32)
        return mesher.downsample_points(
            np.concatenate(clouds).astype(np.float32), downsample
        )

    def extract_mesh(self, res: int | None = None, clean: bool | None = None):
        v, f = mesher.extract_mesh(
            self.state.map_state, self.map_cfg,
            self.state.decoder_params, self.state.decoder_meta,
            res=res or self.mesh_res, compute_dtype=self.compute_dtype,
        )
        if clean is None:
            clean = bool(self.cfg.mapper_specs.get("clean_mesh", False))
        if clean and len(f):
            f = mesher.clean_mesh(
                v, f, self.observed_points(),
                radius=self.map_cfg.voxel_size * 0.5,
            )
        return v, f

    def finalize(self):
        """End-of-sequence: optional no-replay mesh, final_iter replay,
        final poses + mesh (mapping.py:150-169).

        Note: rounds 3-4 carried a ``finalize_realign`` knob here
        (re-register every keyframe against the final field). It was
        measured and rejected — re-registering against the along-biased
        final field produced 30/17/16 cm lateral keyframe jumps
        (EVAL_r04) — and excised in round 5 (VERDICT r4 weak #8)."""
        self._drain()
        st = self.state
        if self.logger is not None:
            v, f = self.extract_mesh()
            self.logger.log_mesh(v, f, name="final_mesh_noreplay.ply")
        if self.final_iter:
            with self.prof.section("finalize_replay"):
                self._replay(len(st.keyframes) + 1)
        poses = self.get_updated_poses()
        if self.logger is not None:
            self.logger.log_numpy_data(np.asarray(poses), "frame_poses")
            # the tracker's own per-frame odometry, before mapper refinement
            # (nerfloam.py:60-63 get_raw_trajectory; useful for
            # odometry-only evaluation)
            self.logger.log_numpy_data(
                np.asarray(self.get_raw_trajectory()), "tracking_trajectory"
            )
            v, f = self.extract_mesh()
            self.logger.log_mesh(v, f, name="final_mesh.ply")
        return poses

    def get_raw_trajectory(self) -> list:
        """The tracker's unrefined per-frame poses (share.py push_pose)."""
        return self.state.tracking_trajectory

    def run(self):
        """Full sequence (demo/run.py behavior)."""
        tspec = self.cfg.tracker_specs
        start = int(tspec.get("start_frame", 0))
        end = int(tspec.get("end_frame", -1))
        stride = int(tspec.get("read_offset", 1))
        n = len(self.dataset)
        if end <= 0:
            end = n - 1
        start, end = min(start, n), min(end, n - 1)

        resumed = self.state.frames_processed > 0
        if resumed:
            # --resume: continue after the last processed frame
            start = max(start, self.state.last_frame.index)
        else:
            init_pose = self.dataset.get_init_pose(start)
            idx, pts, cos, pose = self.dataset[start]
            first = Frame.from_raw(idx, pts, cos, init_pose, self.points_pad,
                                   has_gt_pose=pose is not None)
            self.process_first_frame(first)

        from nerfloam_tpu.data.prefetch import PrefetchingLoader

        ids = [i for i in range(start + 1, end + 1) if i % stride == 0]
        pending = None
        for frame_id, (idx, pts, cos, pose) in PrefetchingLoader(self.dataset, ids):
            frame = Frame.from_raw(
                idx, pts, cos, pose, self.points_pad, has_gt_pose=pose is not None
            )
            frame.device_arrays()  # start the upload while the previous
            #                        frame's device work drains
            if pending is not None:
                with self.prof.section("frame"):
                    self.process_frame(pending)
            pending = frame
        if pending is not None:
            with self.prof.section("frame"):
                self.process_frame(pending)
        return self.finalize()
