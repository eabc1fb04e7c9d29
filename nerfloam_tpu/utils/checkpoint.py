"""Checkpoint / resume.

The reference declared but never wired checkpointing (loggers.py:36-49 has
no call site; --resume is parsed and dropped, SURVEY §5). Here it is real:
the whole SLAM state — lattice map, embeddings, decoder, keyframes,
trajectory bookkeeping — is flat arrays and lists, saved as one npz + json
manifest and restored exactly.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from nerfloam_tpu.core.frame import Frame
from nerfloam_tpu.map import voxel_map as vm


# Per-frame active-set views are derived state (rebuilt by refresh_active
# from the canonical table) — excluded from checkpoints; see the MapState
# docstring in map/voxel_map.py. The (A, 8F) packed table alone is ~134 MB
# f32 at default caps.
DERIVED_MAP_FIELDS = (
    "active_ids", "n_active", "grid_active", "packed", "active_coords",
)


def save_checkpoint(path: str, slam) -> None:
    # defer_sync: a checkpoint must reflect a caught-up frame loop or resume
    # would re-process the in-flight frame
    getattr(slam, "_drain", lambda: None)()
    os.makedirs(path, exist_ok=True)
    st = slam.state
    # Align the live state with what load will rebuild: the frame loop's
    # active views predate the frame's voxel insert (refresh runs before
    # BA/insert inside the megastep), while load re-derives them from the
    # post-insert canonical table. Refreshing here makes save-and-continue
    # bit-identical to save-and-resume.
    st.map_state = vm.refresh_active(st.map_state, slam.map_cfg)
    arrays = {
        f"map_{name}": np.asarray(getattr(st.map_state, name))
        for name in st.map_state._fields
        if name not in DERIVED_MAP_FIELDS
    }
    dec_flat = {}
    for i, layer in enumerate(st.decoder_params["layers"]):
        dec_flat[f"dec_w{i}"] = np.asarray(layer["w"])
        dec_flat[f"dec_b{i}"] = np.asarray(layer["b"])
    dec_flat["dec_out_w"] = np.asarray(st.decoder_params["out"]["w"])
    dec_flat["dec_out_b"] = np.asarray(st.decoder_params["out"]["b"])
    if "gaussian_B" in st.decoder_params:
        dec_flat["dec_gaussian_B"] = np.asarray(st.decoder_params["gaussian_B"])

    kf_arrays = {}
    for i, kf in enumerate(st.keyframes):
        kf_arrays[f"kf{i}_points"] = kf.points
        kf_arrays[f"kf{i}_cos"] = kf.points_cos
        kf_arrays[f"kf{i}_valid"] = kf.valid
        kf_arrays[f"kf{i}_pose6"] = kf.pose6

    np.savez_compressed(
        os.path.join(path, "state.npz"),
        **arrays, **dec_flat, **kf_arrays,
        final_poses=np.asarray(st.final_poses).reshape(-1, 4, 4)
        if st.final_poses else np.zeros((0, 4, 4)),
        fp_kf_idx=np.asarray([i for i, _ in st.frame_poses], np.int64),
        fp_rel=np.stack([r for _, r in st.frame_poses])
        if st.frame_poses else np.zeros((0, 4, 4)),
        tracking_traj=np.asarray(st.tracking_trajectory).reshape(-1, 4, 4)
        if st.tracking_trajectory else np.zeros((0, 4, 4)),
        frame_telemetry=np.asarray(st.frame_telemetry, np.float64).reshape(-1, 4)
        if st.frame_telemetry else np.zeros((0, 4)),
        ba_delta_telemetry=np.asarray(
            st.ba_delta_telemetry, np.float64
        ).reshape(-1, 4)
        if st.ba_delta_telemetry else np.zeros((0, 4)),
        last_pose6=st.last_frame.pose6 if st.last_frame else np.zeros(6),
        rel_pose=st.rel_pose if st.rel_pose is not None else np.eye(4),
        # defer_sync device pose recurrence (raw f32 tracked poses of the
        # last two dispatched frames). The host-side reseed fallback
        # (pipeline._mega_dispatch) reconstructs dev_prev through an f64
        # matrix round-trip, which is NOT bit-identical to the device
        # chain — persisting the exact values keeps resume bit-stable.
        dev_last_pose6=(
            np.asarray(slam._dev_last_pose6, np.float32)
            if getattr(slam, "_dev_last_pose6", None) is not None
            else np.full(6, np.nan, np.float32)
        ),
        dev_prev_pose6=(
            np.asarray(slam._dev_prev_pose6, np.float32)
            if getattr(slam, "_dev_prev_pose6", None) is not None
            else np.full(6, np.nan, np.float32)
        ),
        # RNG state: resume is bit-reproducible against an uninterrupted run
        jax_key=np.asarray(jax.random.key_data(slam.key)),
        py_rng=np.asarray(slam.pyrng.getstate()[1], np.uint32),
    )
    manifest = {
        "map_cfg": slam.map_cfg._asdict(),
        "n_keyframes": len(st.keyframes),
        "kf_indices": [kf.index for kf in st.keyframes],
        "kf_n_points": [kf.n_points for kf in st.keyframes],
        "current_keyframe": next(
            (i for i, kf in enumerate(st.keyframes) if kf is st.current_keyframe),
            -1,
        ),
        "first_frame_id": st.first_frame_id,
        "frames_processed": st.frames_processed,
        "has_rel_pose": st.rel_pose is not None,
        "last_frame_index": st.last_frame.index if st.last_frame else -1,
        "py_rng_version": slam.pyrng.getstate()[0],
        "sdf_bias": np.asarray(
            getattr(slam, "sdf_bias", 0.0), np.float64
        ).reshape(-1).tolist(),  # (2,) [ground, non-ground] since r4
        # grown-on-overflow budgets: overflow is lossless since r5 (grow +
        # replay), but persisting the grown caps keeps resume bit-stable
        # against an uninterrupted run (a resume that restarted at the small
        # auto default would replay growth steps at different shapes).
        # r5 splits the current-frame and replay-window reconcile budgets.
        "touched_cap": int(slam.bp_current.touched_cap),
        "touched_cap_random": int(slam.bp_random.touched_cap),
        "insert_cand_cap": int(slam.insert_cand_cap),
    }
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)


def load_checkpoint(path: str, slam) -> None:
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    data = np.load(os.path.join(path, "state.npz"))
    mc = manifest["map_cfg"]
    slam.map_cfg = vm.MapConfig(
        capacity=int(mc["capacity"]),
        grid_dim=tuple(mc["grid_dim"]),
        voxel_size=float(mc["voxel_size"]),
        feat_dim=int(mc["feat_dim"]),
        emb_dtype=mc["emb_dtype"],
        active_cap=int(mc.get("active_cap", 0)),
        support_dist=float(mc.get("support_dist", 0.0)),
        support_sym=bool(mc.get("support_sym", False)),
    )
    st = slam.state
    st.map_cfg = slam.map_cfg
    fresh = vm.create(slam.map_cfg)  # derived views start as placeholders
    st.map_state = fresh._replace(
        **{
            name: jnp.asarray(data[f"map_{name}"])
            for name in vm.MapState._fields
            if f"map_{name}" in data and name not in DERIVED_MAP_FIELDS
        }
    )
    # rebuild the per-frame active views from the canonical table
    st.map_state = vm.refresh_active(st.map_state, slam.map_cfg)
    for i, layer in enumerate(st.decoder_params["layers"]):
        layer["w"] = jnp.asarray(data[f"dec_w{i}"])
        layer["b"] = jnp.asarray(data[f"dec_b{i}"])
    st.decoder_params["out"]["w"] = jnp.asarray(data["dec_out_w"])
    st.decoder_params["out"]["b"] = jnp.asarray(data["dec_out_b"])
    if "dec_gaussian_B" in data:
        st.decoder_params["gaussian_B"] = jnp.asarray(data["dec_gaussian_B"])

    st.keyframes = []
    for i in range(manifest["n_keyframes"]):
        f = Frame(
            index=manifest["kf_indices"][i],
            points=data[f"kf{i}_points"],
            points_cos=data[f"kf{i}_cos"],
            valid=data[f"kf{i}_valid"],
            n_points=manifest["kf_n_points"][i],
            pose6=data[f"kf{i}_pose6"],
        )
        st.keyframes.append(f)
    cur = manifest["current_keyframe"]
    st.current_keyframe = st.keyframes[cur] if cur >= 0 else None
    st.final_poses = list(data["final_poses"])
    st.frame_poses = list(
        zip(data["fp_kf_idx"].tolist(), list(data["fp_rel"]))
    )
    if "tracking_traj" in data:
        st.tracking_trajectory = list(data["tracking_traj"])
    if "frame_telemetry" in data:
        st.frame_telemetry = [tuple(r) for r in data["frame_telemetry"]]
    if "ba_delta_telemetry" in data:
        st.ba_delta_telemetry = [tuple(r) for r in data["ba_delta_telemetry"]]
    st.first_frame_id = manifest["first_frame_id"]
    st.frames_processed = manifest["frames_processed"]
    if manifest["last_frame_index"] >= 0:
        lf = Frame(
            index=manifest["last_frame_index"],
            points=np.zeros((1, 3), np.float32),
            points_cos=np.ones(1, np.float32),
            valid=np.zeros(1, bool),
            n_points=0,
            pose6=data["last_pose6"],
        )
        st.last_frame = lf
    st.rel_pose = data["rel_pose"] if manifest["has_rel_pose"] else None
    if "jax_key" in data:
        slam.key = jax.random.wrap_key_data(jnp.asarray(data["jax_key"]))
    if "py_rng" in data:
        inner = tuple(int(x) for x in data["py_rng"])
        slam.pyrng.setstate((manifest.get("py_rng_version", 3), inner, None))
    sb = np.asarray(manifest.get("sdf_bias", 0.0), np.float64).reshape(-1)
    # scalar (pre-r4 checkpoints) broadcasts into the (2,) per-class target
    slam.sdf_bias = np.full(2, sb.mean() if sb.size else 0.0, np.float32) \
        if sb.size != 2 else sb.astype(np.float32)
    # restore grown-on-overflow budgets (bit-stable resume: a rerun of the
    # growth's delta-drop must not happen again after resume). Pre-r4
    # checkpoints lack the keys -> keep the config-derived values.
    tc = int(manifest.get("touched_cap", 0))
    if tc > 0:
        tc = min(tc, vm.acap(slam.map_cfg))
        slam.bp_current = slam.bp_current._replace(touched_cap=tc)
        # r5: separate replay-window budget (pre-r5 manifests shared one)
        tcr = min(int(manifest.get("touched_cap_random", tc)),
                  vm.acap(slam.map_cfg))
        slam.bp_random = slam.bp_random._replace(touched_cap=tcr)
    cc = int(manifest.get("insert_cand_cap", 0))
    if cc > 0:
        slam.insert_cand_cap = cc
    slam._mega_cache.clear()  # bp/cand_cap are baked into the megastep
    # defer_sync pipeline state: nothing is in flight at a (drained) save.
    # Restore the exact device pose recurrence when the checkpoint has it
    # (bit-stable resume); otherwise fall back to the host reseed in
    # pipeline._mega_dispatch (pre-r4 checkpoints).
    slam._inflight = None
    slam._dev_last_pose6 = None
    slam._dev_prev_pose6 = None
    if "dev_last_pose6" in data:
        dl = np.asarray(data["dev_last_pose6"], np.float32)
        dp = np.asarray(data["dev_prev_pose6"], np.float32)
        if np.isfinite(dl).all() and np.isfinite(dp).all():
            slam._dev_last_pose6 = jnp.asarray(dl)
            slam._dev_prev_pose6 = jnp.asarray(dp)
