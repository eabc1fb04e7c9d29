"""YAML configuration with recursive ``base_config`` inheritance.

Behavior-compatible with the reference's ArgumentParserX (/root/reference/
demo/parser.py:4-62): a config YAML may name a ``base_config`` whose values
it recursively overrides; every loaded key is exposed as a CLI flag
(--key value, with nested groups addressable as --group.key). Adds the
TPU-framework's own knobs (static capacities, sample budgets, device opts)
with derived defaults so the reference's unmodified YAML files work as-is.
"""

from __future__ import annotations

import argparse
import copy
import math
import os
from typing import Any, Dict

import yaml


def update_recursive(dict1: Dict, dict2: Dict) -> Dict:
    """dict2 wins; nested dicts merge (parser.py:49-56 semantics)."""
    for k, v in dict2.items():
        if isinstance(v, dict):
            node = dict1.setdefault(k, {})
            if isinstance(node, dict):
                update_recursive(node, v)
            else:
                dict1[k] = v
        else:
            dict1[k] = v
    return dict1


def load_yaml_with_bases(path: str) -> Dict:
    with open(path, "r") as f:
        cfg = yaml.safe_load(f) or {}
    base = cfg.get("base_config")
    if base is not None:
        # base paths are repo-relative like the reference's configs/
        candidates = [base, os.path.join(os.path.dirname(path), os.path.basename(base))]
        root = os.path.dirname(os.path.dirname(os.path.abspath(path)))
        candidates.append(os.path.join(root, os.path.basename(base)))
        for c in candidates:
            if os.path.exists(c):
                base_cfg = load_yaml_with_bases(c)
                cfg = update_recursive(base_cfg, cfg)
                break
        else:
            raise FileNotFoundError(f"base_config {base!r} not found")
    return cfg


class Config:
    """Attribute/namespace view over the merged config dict."""

    def __init__(self, d: Dict[str, Any]):
        self._d = d

    def __getattr__(self, k):
        d = object.__getattribute__(self, "_d")
        if k in d:
            v = d[k]
            return v
        raise AttributeError(k)

    def __getitem__(self, k):
        return self._d[k]

    def get(self, k, default=None):
        return self._d.get(k, default)

    def as_dict(self) -> Dict:
        return copy.deepcopy(self._d)

    def __contains__(self, k):
        return k in self._d

    def __repr__(self):
        return f"Config({self._d})"


DEFAULTS = {
    # groups the reference configs always carry
    "criteria": {},
    "decoder_specs": {},
    "tracker_specs": {},
    "mapper_specs": {},
    "data_specs": {},
    "debug_args": {},
    # TPU-framework additions (all optional)
    "tpu_specs": {
        "points_pad": 131072,        # static per-frame point-buffer size
        "kf_points_pad": 65536,      # static keyframe point-buffer size
        "map_capacity": 1 << 19,     # initial lattice rows (grows by re-jit)
        "track_samples": 128,        # per-ray sample budget (tracking)
        "map_samples": 64,           # per-ray sample budget (mapping BA)
        "region_z_half": 20.0,       # vertical half-extent of the local grid (m)
        "region_margin": 4.0,        # lateral slack (m)
        "bootstrap_steps": 20,       # first-frame mapping calls (replaces the
                                     # reference's timing-dependent bootstrap
                                     # spin, mapping.py:106-108)
        "compute_dtype": "float32",  # MLP matmul dtype ("bfloat16" on TPU)
        "emb_dtype": "float32",      # embedding storage (ref uses bfloat16)
        "active_cap": 1 << 18,       # per-frame active surface-voxel budget
        #                              (grows automatically on overflow)
        "touched_cap": 0,            # BA delta-reconciliation budget;
        #                              0 -> auto: current-frame steps start
        #                              at min(active_cap, 8192), replay-
        #                              window steps at min(active_cap,
        #                              32768) (their touched footprints
        #                              differ ~10x — EVAL_r04 autocap500),
        #                              each doubling independently on
        #                              overflow. Overflow is LOSSLESS (r5):
        #                              the step is replayed from its
        #                              pre-dispatch state at the grown cap,
        #                              costing one re-jit + one replayed
        #                              step, never data. The reconcile
        #                              scatter is O(touched_cap), so set
        #                              explicitly only to pin shapes (e.g.
        #                              bench timing).
        "reconcile_mode": "mean",    # shared-corner delta combining
        #                              ("mean" | "sum"), voxel_map.reconcile_packed
        "exact_embedding_grads": False,  # reference-exact (slow) BA grads
        "track_resample_rays": False,    # reference-exact per-iter resampling
        "ba_ray_superset": 2,            # BA hoisted-march superset (0=exact)
        "dp": 1,                         # BA ray data-parallelism over a
        #                                  device mesh (1 = single chip,
        #                                  fused megastep)
        "coarse_factor": 1.0,            # occupancy-march step / voxel_size
        "sampler": "grid",               # render sampler: "hits" (per-step
        #                                  hit table + in-register placement,
        #                                  ~1.6x frame throughput) | "grid"
        #                                  (per-sample grid lookups)
        "max_hits": 20,                  # "hits": hit-list cap per ray
        #                                  (reference n_max=20,
        #                                  voxel_helpers.py:533)
        "bias_source": "window",         # bias_correction probe: "window"
        #                                  (post-BA transient, round-2) |
        #                                  "keyframe" (settled keyframe
        #                                  cloud, ba.surface_bias_at)
        "bias_classes": 1,               # 1 = pooled band target (shipped);
        #                                  2 = separate ground / non-ground
        #                                  targets from the settled keyframe
        #                                  probe (requires
        #                                  bias_source=keyframe)
        "defer_sync": True,              # pipeline the per-frame host sync:
        #                                  dispatch frame N, then fetch frame
        #                                  N-1's results while N computes.
        #                                  Hides the whole per-frame host
        #                                  side (~61 ms/frame on the tunnel:
        #                                  fetch + numpy bookkeeping) at the
        #                                  cost of one frame of host lag
        #                                  (keyframe insertion, bias EMA,
        #                                  remove_back) — _mega_dispatch.
        #                                  Default ON since r4: +29% scans/s,
        #                                  quality-neutral at 500 frames
        #                                  (EVAL_r04 defer500_s777); set
        #                                  false for the reference-faithful
        #                                  schedule.
        "recenter_margin": 0.0,          # >0: lazy recentering — skip the
        #                                  per-frame grid rebuild + repack
        #                                  while the sensor is within this
        #                                  many meters of the region center
        #                                  (inserts append to the active set
        #                                  incrementally). Must be <= region
        #                                  half-extent - max_depth; <= the
        #                                  region_margin default (4) is
        #                                  always safe
        "track_method": "gn",            # "gn" (LM solver, default: ~10x lower
        #                                  curved-trajectory ATE at equal cost,
        #                                  docs/PERF.md A/B) | "adam" (reference
        #                                  parity, render_helpers.py:428-514)
        "track_gn_iterations": 16,
        "surface_anchor": 0,             # extra render samples AT each
        #                                  measured point; int = loss
        #                                  weight, 0 = off
        "band_samples": 0,               # extra stratified samples across
        #                                  the truncation band around each
        #                                  measured depth, 0 = off
        "ba_pose_project": "none",       # "along": the current-frame BA
        #                                  optimizer projects the along-track
        #                                  (tracked motion direction)
        #                                  component out of every pose update
        #                                  (degeneracy-aware BA, LOAM
        #                                  solution-remapping lineage). Done
        #                                  IN-optimizer, per iteration: the
        #                                  embeddings co-adapt with the pose,
        #                                  so a post-hoc host correction
        #                                  would leave the shift baked into
        #                                  the map. The r5 gain probe
        #                                  measured along-track as the
        #                                  weak-observability axis; ba_delta
        #                                  telemetry attributed +0.37 of the
        #                                  +0.62 cm/f closed-loop along drift
        #                                  to this refinement, while its z
        #                                  component CORRECTS tracker z drift
        #                                  — project out along only.
        #                                  "none" = off
        "maturity_warmup": 0,            # > 0: GN tracker down-weights
        #                                  residual samples in voxels whose
        #                                  BA-touch count < this (frontier
        #                                  drift fix — the live field's
        #                                  under-converged frontier pulls
        #                                  the pose forward, EVAL_r04
        #                                  frontier probe); 0 = off
        "maturity_floor": 0.25,          # minimum maturity weight
        "support_dist": 0.0,             # meters past each measured point
        #                                  to allocate a support voxel
        #                                  (below ground / behind walls) so
        #                                  the negative SDF band is
        #                                  sampleable; 0 = off
        "support_sym": False,            # also allocate the sensor-side
        #                                  mirror voxel (above ground / in
        #                                  front of walls)
        "bias_correction": False,        # tracker band target = EMA of the
        #                                  mapped field's measured surface
        #                                  offset (BAResult.surface_bias)
        #                                  instead of 0 — cancels the
        #                                  field-fit bias that integrates
        #                                  into per-frame drift
        "replay_freq": 0,                # >0: one random keyframe-window
        #                                  replay step every N frames
        #                                  (reference mapper parity; re-pins
        #                                  old regions against drift)
        "s2s_weight": 0.0,               # >0: scan-to-scan projective
        #                                  point-to-plane term in the GN
        #                                  tracker (core/scan2scan.py) —
        #                                  map-independent relative-motion
        #                                  observation against along-track
        #                                  drift. ~5-50 balances it against
        #                                  the SDF term; 0 = off
        "s2s_elev": 64,                  # s2s range-image elevation bins
        "s2s_az": 1024,                  # s2s range-image azimuth bins
        "s2s_gate": 1.0,                 # s2s correspondence gate (m)
        "s2s_huber": 0.2,                # s2s Huber transition (m)

        "const_vel_full": True,          # SE(3) warm start incl. rotation
        #                                  (A/B docs/PERF.md: best raw ATE;
        #                                  False = reference parity,
        #                                  translation-only tracking.py:113)
        "mesh_backend": "mt",        # "mt" (device marching tetrahedra)
        "seed": 777,
    },
}


def finalize(cfg: Dict) -> Config:
    merged = copy.deepcopy(DEFAULTS)
    update_recursive(merged, cfg)
    return Config(merged)


def derive_static_shapes(cfg: Config) -> Dict[str, Any]:
    """Compute the static-shape parameters the jitted programs need."""
    vs = cfg.mapper_specs["voxel_size"]
    max_depth = float(cfg.data_specs["max_depth"])
    key_distance = float(cfg.mapper_specs.get("key_distance", 12.0))
    keyframe_gap = float(cfg.mapper_specs.get("keyframe_gap", 8.0))
    window = int(cfg.mapper_specs["window_size"])
    margin = float(cfg.tpu_specs["region_margin"])
    # region must cover the tracked frame's full-range ball and every window
    # keyframe's (cropped) ball — see map/voxel_map.py docstring
    half_xy = max(max_depth, window * keyframe_gap + key_distance * 1.8) + margin
    half_z = float(cfg.tpu_specs["region_z_half"])
    Dxy = 2 * math.ceil(half_xy / vs)
    Dz = 2 * math.ceil(half_z / vs)

    track_step = float(cfg.tracker_specs["step_size"]) * vs
    map_step = float(cfg.mapper_specs["step_size"]) * vs
    return {
        "grid_dim": (Dxy, Dxy, Dz),
        "track_step_world": track_step,
        "map_step_world": map_step,
        "track_n_slots": math.ceil(max_depth / track_step) + 1,
        "map_n_slots": math.ceil(max_depth / map_step) + 1,
        "max_depth": max_depth,
        "voxel_size": vs,
    }


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="nerfloam_tpu — TPU-native neural-SDF LiDAR SLAM"
    )
    p.add_argument("config", type=str, help="YAML config (supports base_config)")
    p.add_argument("--resume", default=None, type=str, help="checkpoint dir to resume")
    p.add_argument("--debug", action="store_true")
    p.add_argument(
        "--set",
        action="append",
        default=[],
        metavar="group.key=value",
        help="override any config value, e.g. --set tracker_specs.num_iterations=10",
    )
    return p


def _parse_value(s: str):
    for cast in (int, float):
        try:
            return cast(s)
        except ValueError:
            pass
    if s.lower() in ("true", "false"):
        return s.lower() == "true"
    return s


def _bool_flag(s: str) -> bool:
    if s.lower() in ("true", "1", "yes"):
        return True
    if s.lower() in ("false", "0", "no"):
        return False
    raise argparse.ArgumentTypeError(f"expected a bool, got {s!r}")


def _flag_items(d: Dict, prefix: str = "") -> Dict[str, Any]:
    """Flatten a config dict to {'group.key': leaf_value} flag names."""
    out: Dict[str, Any] = {}
    for k, v in d.items():
        name = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flag_items(v, name + "."))
        else:
            out[name] = v
    return out


def parse_cli(argv: list[str] | None = None):
    """Two-phase CLI parse with per-key flag promotion.

    Reference parity (/root/reference/demo/parser.py:9-21): after the config
    YAML is loaded, every key becomes its own overridable ``--key`` flag.
    The reference promotes only top-level keys (so in practice just its
    top-level scalars like --log_dir/--exp_name are usable); here every LEAF
    key is promoted — top-level scalars keep the reference spelling
    (``--exp_name``) and nested keys are addressable as ``--group.key``
    (``--tracker_specs.num_iterations 10``). ``--set group.key=val`` remains
    as the list-style alternative and is applied last.

    Returns ``(args, cfg)`` with all overrides already folded into ``cfg``.
    """
    p = build_arg_parser()
    known, _ = p.parse_known_args(argv)
    base = finalize(load_yaml_with_bases(known.config)).as_dict()
    flags = _flag_items(base)
    for name, default in flags.items():
        if default is None:
            typ = _parse_value
        elif isinstance(default, bool):  # bool("False") is True — parse it
            typ = _bool_flag
        elif isinstance(default, (list, tuple)):
            typ = yaml.safe_load
        else:
            typ = type(default)
        try:
            p.add_argument(
                "--" + name, type=typ, default=argparse.SUPPRESS,
                required=False, dest=name,
            )
        except argparse.ArgumentError:
            continue  # name collides with a built-in flag (e.g. --resume)
    args = p.parse_args(argv)
    provided = {k: v for k, v in vars(args).items() if k in flags}
    for name, val in provided.items():
        node = base
        parts = name.split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = val
    for ov in args.set:
        key, _, val = ov.partition("=")
        node = base
        parts = key.split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = _parse_value(val)
    return args, Config(base)


def load_config(path: str, overrides: list[str] | None = None) -> Config:
    cfg = load_yaml_with_bases(path)
    merged = finalize(cfg)
    d = merged.as_dict()
    for ov in overrides or []:
        key, _, val = ov.partition("=")
        node = d
        parts = key.split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = _parse_value(val)
    return Config(d)
