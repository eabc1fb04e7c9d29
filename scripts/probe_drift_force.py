"""Feedback-free tracker-pull probe: the per-frame drift PREDICTOR.

The 500-frame evals show an along-track drift rate (~ +0.55 cm/frame) that
is invariant to every bias knob (EVAL_r04.md). Closed-loop A/Bs cost ~1000 s
of chip time per data point; this probe measures the same quantity open
loop in seconds per variant:

  1. Build the map in mapping-only mode (GT poses) for N frames — no
     tracking feedback, so the field is exactly what a perfect tracker
     would have produced.
  2. For settled frames (well inside the mapped region), run the SHIPPED
     GN tracker initialized AT the GT pose against the final field. Any
     displacement of the converged pose from GT is the tracker's
     systematic pull — the quantity that integrates into drift.
  3. Decompose the pull into along-track / lateral / z (GT travel frame)
     per bias variant: off, per-class settled bias (ba.surface_bias_at),
     per-class + affine-in-depth (scale hypothesis).
  4. Regress the settled field's residual sdf at GT surface points against
     measured depth, per class: a nonzero slope = the settled bias is
     range-dependent (a range-scale error), which a constant bias target
     cannot cancel — the working hypothesis for the along-track invariant.

Result (EVAL_r04): the SETTLED field predicts along -1.0 +/- 1.0 cm
(wrong sign, noise-dominated) and scale_err -0.11% — the settled field
does NOT explain the +0.55 cm/f closed-loop drift. Hence:

  --mode frontier: probe the pull in the REAL operating regime. Process
  frames with GT poses one at a time; every probe_every frames, run the
  shipped tracker on frame i+1 (GT-initialized) against the map AS OF
  frame i — exactly what the closed-loop tracker faces (fresh, possibly
  under-converged voxels ahead; settled map behind), minus accumulated
  drift. If the frontier pull is along-POSITIVE ~0.5 cm/f, the
  under-converged-frontier hypothesis is confirmed.

Usage:
    JAX_PLATFORMS=cpu python scripts/probe_drift_force.py \
        [--mode settled|frontier] \
        [--config configs/synthetic/kitti_replica_ci.yaml] [--frames 60] \
        [--set k=v ...]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from nerfloam_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=("settled", "frontier", "gain"),
                   default="settled")
    p.add_argument("--config", default="configs/synthetic/kitti_replica_ci.yaml")
    p.add_argument("--set", action="append", default=[])
    p.add_argument("--frames", type=int, default=60)
    p.add_argument("--probe-every", type=int, default=5,
                   help="probe frame stride inside the settled region")
    p.add_argument("--settle-margin", type=int, default=12,
                   help="settled mode: skip the last M frames (frontier, "
                        "still training)")
    p.add_argument("--warmup", type=int, default=10,
                   help="frontier mode: first probed frame")
    p.add_argument("--maturity-sweep", action="store_true",
                   help="frontier mode: also probe tracker variants with "
                        "voxel-maturity down-weighting (warmup x floor "
                        "grid) — the frontier-drift fix A/B")
    p.add_argument("--json-out", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from nerfloam_tpu.core.ba import surface_bias_at
    from nerfloam_tpu.core.frame import Frame
    from nerfloam_tpu.core.pipeline import NerfLoamSLAM
    from nerfloam_tpu.core.render import field_at
    from nerfloam_tpu.data import get_dataset
    from nerfloam_tpu.map import voxel_map as vm
    from nerfloam_tpu.ops import se3
    from nerfloam_tpu.utils.config import load_config

    overrides = [
        f"data_specs.n_frames={args.frames}",
        "data_specs.use_gt=True",
        "tpu_specs.track_method=gn",  # probe the shipped tracker
    ] + (args.set or [])
    cfg = load_config(args.config, overrides)
    ds = get_dataset(cfg)
    slam = NerfLoamSLAM(cfg, ds)

    def travel_frame(i):
        Tm = np.asarray(ds[i - 1][3])
        Tp = np.asarray(ds[i + 1][3])
        fwd = Tp[:3, 3] - Tm[:3, 3]
        n = np.linalg.norm(fwd)
        fwd = fwd / (n + 1e-12)
        up = np.array([0.0, 0.0, 1.0])
        lat = np.cross(up, fwd)
        lat /= np.linalg.norm(lat) + 1e-12
        return fwd, lat

    def track_pull(j, bias, tp=None, init_dt=None):
        """Run the shipped tracker on frame j, initialized AT its GT pose
        (optionally displaced by ``init_dt``, meters, world frame), against
        the CURRENT map; return the converged displacement in the GT travel
        frame (along, lat, dz in m; rot in deg). ``tp`` overrides the
        shipped TrackParams (maturity sweep)."""
        st = slam.state
        mc = slam.map_cfg
        _, pts, cos, pose = ds[j]
        frame = Frame.from_raw(j, np.asarray(pts, np.float32),
                               np.asarray(cos, np.float32),
                               np.asarray(pose), slam.points_pad,
                               has_gt_pose=True)
        gt_T = frame.pose_matrix()
        fwd, lat = travel_frame(j)
        init6 = jnp.asarray(frame.pose6)
        if init_dt is not None:
            T0 = np.asarray(gt_T).copy()
            T0[:3, 3] += np.asarray(init_dt, np.float64)
            init6 = jnp.asarray(np.asarray(
                se3.pose_from_matrix(jnp.asarray(T0, jnp.float32))))
        pts_d, cos_d, val_d = frame.device_arrays()
        res = slam._track_fn(
            st.map_state, mc, slam.rc_track, tp or slam.tp,
            st.decoder_params, st.decoder_meta,
            init6, pts_d, cos_d, val_d,
            slam._lr_track_lo, jax.random.PRNGKey(1234 + j),
            jnp.asarray(bias, jnp.float32),
        )
        est_T = np.asarray(se3.pose_matrix(jnp.asarray(np.asarray(res.pose))))
        dt = est_T[:3, 3] - gt_T[:3, 3]
        dR = est_T[:3, :3] @ gt_T[:3, :3].T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        return (float(dt @ fwd), float(dt @ lat), float(dt[2]), float(ang))

    def summarize(variants):
        out = {}
        for vname, rows in variants.items():
            a = np.asarray([r[1:] for r in rows])  # drop frame id
            out[vname] = {
                "n_frames": int(len(a)),
                "along_cm_mean": round(float(a[:, 0].mean()) * 100, 3),
                "lat_cm_mean": round(float(a[:, 1].mean()) * 100, 3),
                "dz_cm_mean": round(float(a[:, 2].mean()) * 100, 3),
                "rot_deg_mean": round(float(a[:, 3].mean()), 4),
                "along_cm_std": round(float(a[:, 0].std()) * 100, 3),
            }
        return out

    if args.mode == "frontier":
        # ---- frontier pull: probe frame i+1 against the map as of frame i
        # while the map is being built with GT poses — the closed-loop
        # tracker's exact operating regime minus accumulated drift.
        idx, pts, cos, pose = ds[0]
        first = Frame.from_raw(idx, pts, cos, ds.get_init_pose(0),
                               slam.points_pad, has_gt_pose=pose is not None)
        slam.process_first_frame(first)
        variants = {}
        for i in range(1, args.frames - 2):
            idx, pts, cos, pose = ds[i]
            f = Frame.from_raw(idx, pts, cos, pose, slam.points_pad,
                               has_gt_pose=True)
            slam.process_frame(f)
            j = i + 1
            if i >= args.warmup and (i - args.warmup) % args.probe_every == 0:
                bias0 = np.zeros(2, np.float32)
                probes = [
                    ("bias_off", bias0, None),
                    # the live shipped window-EMA bias at this point in the run
                    ("bias_live", np.asarray(slam.sdf_bias, np.float32), None),
                ]
                if args.maturity_sweep:
                    for w, fl in ((4, 0.25), (8, 0.25), (16, 0.25),
                                  (8, 0.05)):
                        probes.append((
                            f"mat{w}_f{int(fl * 100):02d}", bias0,
                            slam.tp._replace(maturity_warmup=w,
                                             maturity_floor=fl),
                        ))
                for vname, bias, tp in probes:
                    variants.setdefault(vname, []).append(
                        (j,) + track_pull(j, bias, tp)
                    )
        out = {
            "config": args.config,
            "mode": "frontier",
            "frames": args.frames,
            "per_frame": {
                v: [[r[0]] + [round(x * 100, 3) for x in r[1:4]]
                    for r in rows]  # [frame, along_cm, lat_cm, dz_cm]
                for v, rows in variants.items()
            },
            "tracker_pull": summarize(variants),
        }
        print(json.dumps(out, indent=1))
        if args.json_out:
            with open(args.json_out, "w") as fh:
                json.dump(out, fh)
        return

    if args.mode == "gain":
        # ---- feedback loop gain: how much of an injected init error
        # survives one track call in the frontier regime? The open-loop
        # pull at HEAD is ~0 (frontier_maturity.json) yet closed-loop runs
        # drift +0.55 cm/f along-track — if the tracker only removes a
        # fraction (1-g) of its init error along-track (weak along-track
        # observability: LiDAR geometry constrains lateral/z via walls and
        # ground but along-track only via range texture), then const-vel
        # extrapolation compounds the surviving fraction into a random
        # walk with variance ~ (g/(1-g)) * per-frame noise — and any tiny
        # systematic forward residue integrates linearly. g_along >>
        # g_lat/g_z is the signature.
        idx, pts, cos, pose = ds[0]
        first = Frame.from_raw(idx, pts, cos, ds.get_init_pose(0),
                               slam.points_pad, has_gt_pose=pose is not None)
        slam.process_first_frame(first)
        delta = 0.05  # 5 cm injected init error
        variants = {}
        for i in range(1, args.frames - 2):
            idx, pts, cos, pose = ds[i]
            f = Frame.from_raw(idx, pts, cos, pose, slam.points_pad,
                               has_gt_pose=True)
            slam.process_frame(f)
            j = i + 1
            if i >= args.warmup and (i - args.warmup) % args.probe_every == 0:
                fwd, lat = travel_frame(j)
                up = np.array([0.0, 0.0, 1.0])
                bias0 = np.zeros(2, np.float32)
                base = track_pull(j, bias0)
                variants.setdefault("base", []).append((j,) + base)
                for vname, direction in (
                    ("along+", fwd), ("along-", -fwd),
                    ("lat+", lat), ("z+", up),
                ):
                    r = track_pull(j, bias0, init_dt=direction * delta)
                    variants.setdefault(vname, []).append((j,) + r)
        # surviving-error gain per direction: (perturbed - base) pull
        # projected on the injected axis, / delta
        gains = {}
        base_rows = {r[0]: r[1:] for r in variants["base"]}
        axis_of = {"along+": (0, +1), "along-": (0, -1),
                   "lat+": (1, +1), "z+": (2, +1)}
        for vname, (ax, sign) in axis_of.items():
            gs = []
            for r in variants[vname]:
                b = base_rows[r[0]]
                gs.append(sign * (r[1 + ax] - b[ax]) / delta)
            gs = np.asarray(gs)
            gains[vname] = {
                "gain_mean": round(float(gs.mean()), 4),
                "gain_std": round(float(gs.std()), 4),
                "n": int(len(gs)),
            }
        out = {
            "config": args.config,
            "mode": "gain",
            "frames": args.frames,
            "delta_cm": delta * 100,
            "tracker_pull": summarize(variants),
            "survival_gain": gains,
        }
        print(json.dumps(out, indent=1))
        if args.json_out:
            with open(args.json_out, "w") as fh:
                json.dump(out, fh)
        return

    slam.run()

    st = slam.state
    mc = slam.map_cfg
    probe_ids = list(range(10, args.frames - args.settle_margin,
                           args.probe_every))

    # ---- 4. settled residual-sdf regression vs depth, per class ----------
    reg = {"ground": [[], []], "nonground": [[], []]}
    for i in probe_ids:
        _, pts, cos, pose = ds[i]
        pts = np.asarray(pts, np.float32)
        cos = np.asarray(cos, np.float32)
        T = np.asarray(pose)
        w = (pts @ T[:3, :3].T + T[:3, 3]).astype(np.float32)
        depth = np.linalg.norm(pts, axis=-1)
        p3 = jnp.asarray(w)
        cells = jnp.floor(p3 / mc.voxel_size).astype(jnp.int32)
        aid = vm.lookup_active(st.map_state, mc, cells)
        sdf = np.asarray(
            field_at(st.map_state, mc, st.decoder_params, st.decoder_meta,
                     p3, aid, jnp.float32)
        )
        ok = (np.asarray(aid) >= 0) & (depth > 0.5) & (depth < slam.rc_map.max_depth)
        g = cos < 0.999
        for name, m in (("ground", ok & g), ("nonground", ok & ~g)):
            reg[name][0].append(depth[m])
            reg[name][1].append(sdf[m])

    trunc = float(cfg.criteria["sdf_truncation"])
    reg_out = {}
    for name, (ds_, ss_) in reg.items():
        d = np.concatenate(ds_) if ds_ else np.zeros(0)
        s = np.concatenate(ss_) if ss_ else np.zeros(0)
        if len(d) < 100:
            reg_out[name] = None
            continue
        A = np.stack([np.ones_like(d), d], axis=-1)
        coef, *_ = np.linalg.lstsq(A, s, rcond=None)
        reg_out[name] = {
            "n": int(len(d)),
            "mean_sdf": round(float(s.mean()), 5),
            "intercept": round(float(coef[0]), 5),
            "slope_per_m": round(float(coef[1]), 6),
            # slope in meters of surface displacement per meter of range
            # (sdf is in truncation units): the effective range-scale error
            "scale_err_pct": round(float(coef[1]) * trunc * 100, 4),
        }

    # ---- 2+3. tracker pull at GT pose, per bias variant -------------------
    def settled_bias2(frame, pose6):
        pts_d, cos_d, val_d = frame.device_arrays()
        out = np.asarray(surface_bias_at(
            st.map_state, mc, st.decoder_params, st.decoder_meta,
            jnp.asarray(pose6), pts_d, val_d, slam.rc_map.max_depth,
            points_cos=cos_d,
        ))
        b, c = out[0], out[1]
        return np.where(c > 0, b, 0.0).astype(np.float32)

    variants = {}
    for i in probe_ids:
        _, pts, cos, pose = ds[i]
        frame = Frame.from_raw(i, np.asarray(pts, np.float32),
                               np.asarray(cos, np.float32),
                               np.asarray(pose), slam.points_pad,
                               has_gt_pose=True)
        b2 = settled_bias2(frame, frame.pose6.copy())
        for vname, bias in (
            ("bias_off", np.zeros(2, np.float32)),
            ("bias_class2", b2),
        ):
            variants.setdefault(vname, []).append((i,) + track_pull(i, bias))

    out = {
        "config": args.config,
        "mode": "settled",
        "frames": args.frames,
        "probe_ids": probe_ids,
        "residual_regression": reg_out,
        "tracker_pull": summarize(variants),
    }
    print(json.dumps(out, indent=1))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f)


if __name__ == "__main__":
    main()
