"""Trajectory error decomposition — the drift-debugging workhorse.

ATE alone hides WHICH degree of freedom drifts; every round-2/3 drift fix
came from this decomposition (vertical sink, along-track overshoot,
turn-rate miss — docs/PERF.md, EVAL_r02.md). Reads the .npz written by
`scripts/eval_replica.py --dump-traj` (est + gt stacks of (N, 4, 4)).

Usage:
  python scripts/traj_decompose.py /tmp/traj.npz [--segments 5]
"""

import argparse

import numpy as np


def rel(T):
    return np.linalg.inv(T[:-1]) @ T[1:]


def yaw_of(R):
    return np.arctan2(R[:, 1, 0], R[:, 0, 0])


def roll_pitch_of(R):
    pitch = -np.arcsin(np.clip(R[:, 2, 0], -1, 1))
    roll = np.arctan2(R[:, 2, 1], R[:, 2, 2])
    return roll, pitch


def decompose(est: np.ndarray, gt: np.ndarray, segments: int = 5):
    N = len(est)
    te, tg = est[:, :3, 3], gt[:, :3, 3]
    err = np.linalg.norm(te - tg, axis=1)
    path = np.sum(np.linalg.norm(np.diff(tg, axis=0), axis=1))
    re_, rg = rel(est), rel(gt)

    # per-frame incremental translation error, decomposed in the GT motion
    # frame: along-track (odometry scale bias), lateral, vertical
    diff = re_[:, :3, 3] - rg[:, :3, 3]
    fwd = rg[:, :3, 3] / (np.linalg.norm(rg[:, :3, 3], axis=1, keepdims=True) + 1e-9)
    along = np.einsum("ij,ij->i", diff, fwd)
    dz = re_[:, 2, 3] - rg[:, 2, 3]
    lat = np.linalg.norm(diff - along[:, None] * fwd, axis=1)

    dyaw = np.degrees(yaw_of(re_[:, :3, :3]) - yaw_of(rg[:, :3, :3]))
    dyaw = (dyaw + 180) % 360 - 180
    er, ep = roll_pitch_of(re_[:, :3, :3])
    gr, gp = roll_pitch_of(rg[:, :3, :3])

    print(f"N={N}  path={path:.0f} m  ate_raw={np.sqrt((err**2).mean()):.3f} m"
          f"  final_err={err[-1]:.3f} m ({100 * err[-1] / max(path, 1e-9):.2f}% of path)")
    print(f"mean rates: along {along.mean() * 100:+.3f} cm/f   "
          f"lateral {lat.mean() * 100:.3f} cm/f   dz {dz.mean() * 100:+.3f} cm/f   "
          f"dyaw {dyaw.mean():+.4f} deg/f   "
          f"droll {np.degrees(er - gr).mean():+.4f}   "
          f"dpitch {np.degrees(ep - gp).mean():+.4f} deg/f")

    # turn-rate miss: fraction of GT rotation the tracker fails to follow
    gtrate = np.degrees(yaw_of(rg[:, :3, :3]))
    gtrate = (gtrate + 180) % 360 - 180
    for name, m in [("straight", np.abs(gtrate) < 0.05),
                    ("gentle-curve", (np.abs(gtrate) >= 0.05) & (np.abs(gtrate) < 0.5)),
                    ("turn", np.abs(gtrate) >= 0.5)]:
        if m.sum():
            miss = (np.sum(dyaw[m] * np.sign(gtrate[m]))
                    / np.maximum(np.sum(np.abs(gtrate[m])), 1e-9))
            print(f"  {name:13s} n={int(m.sum()):4d}  dyaw {dyaw[m].mean():+.4f} deg/f"
                  f"  rotation-miss {miss:+.4f}")

    # per-segment rates: a constant-rate drift shows up flat, an end-of-run
    # regression (map quality collapse) shows up in the last rows
    bounds = np.linspace(0, N - 1, segments + 1).astype(int)
    for a, b in zip(bounds[:-1], bounds[1:]):
        s = slice(a, b)
        print(f"  frames {a:4d}-{b:<4d} cum_err {err[b]:6.2f} m   "
              f"along {along[s].mean() * 100:+6.2f}  lat {lat[s].mean() * 100:5.2f}  "
              f"dz {dz[s].mean() * 100:+6.2f} cm/f   |dyaw| {np.abs(dyaw[s]).mean():.3f} deg/f")

    dtrans = np.linalg.norm(diff, axis=1)
    worst = np.argsort(dtrans)[-5:][::-1]
    print("  worst single-frame steps:",
          [(int(i), f"{dtrans[i] * 100:.1f} cm") for i in worst])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("npz", help=".npz with est/gt (eval_replica.py --dump-traj)")
    p.add_argument("--segments", type=int, default=5)
    args = p.parse_args()
    d = np.load(args.npz)
    decompose(d["est"], d["gt"], args.segments)


if __name__ == "__main__":
    main()
