"""CLI entry point: python demo/run.py <config.yaml> [--set group.key=val].

Behavior-compatible with /root/reference/demo/run.py: loads a YAML config
(with base_config inheritance), seeds RNGs, runs the full SLAM pipeline,
writes trajectory + meshes into a timestamped run directory.
"""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from nerfloam_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from nerfloam_tpu.core.pipeline import NerfLoamSLAM
from nerfloam_tpu.data import get_dataset
from nerfloam_tpu.utils.config import parse_cli
from nerfloam_tpu.utils.logger import RunLogger
from nerfloam_tpu.utils.profiler import Profiler


def main():
    # every YAML key is a CLI flag (--exp_name X, --tracker_specs.num_iterations 10)
    args, cfg = parse_cli()
    np.random.seed(int(cfg.tpu_specs["seed"]))

    dataset = get_dataset(cfg)
    logger = RunLogger(
        cfg.get("log_dir", "./logs"),
        cfg.get("exp_name", "run"),
        config=cfg.as_dict(),
    )
    prof = Profiler(verbose=bool(cfg.debug_args.get("verbose", False)))
    slam = NerfLoamSLAM(cfg, dataset, logger=logger, profiler=prof)

    if args.resume:
        from nerfloam_tpu.utils.checkpoint import load_checkpoint

        load_checkpoint(args.resume, slam)
        print(f"resumed from {args.resume} at frame {slam.state.frames_processed}")

    poses = slam.run()
    prof.report()

    from nerfloam_tpu.utils.checkpoint import save_checkpoint

    save_checkpoint(os.path.join(logger.dir, "ckpt", "final"), slam)
    print(f"done: {len(poses)} poses -> {logger.dir}")


if __name__ == "__main__":
    main()
