"""nerfloam_tpu — a TPU-native neural-SDF LiDAR SLAM framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of NeRF-LOAM
(JunyuanDeng/NeRF-LOAM, arXiv 2303.10709): incremental LiDAR odometry and
mapping where the map is a sparse voxel field of learned embeddings decoded
by a shared SDF MLP.

Architecture (TPU-first, not a port):
  - ``map``      : unified lattice table + dense region-local grid — the
                   scatter/gather replacement for the reference's pointer
                   octree (third_party/sparse_octree).
  - ``ops``      : SE(3), lattice keys/Morton codec, trilinear interp,
                   jittered-grid ray sampling, marching tetrahedra —
                   replacing the reference's CUDA ray kernels
                   (third_party/sparse_voxels, marching_cubes).
  - ``models``   : the shared SDF decoder MLP (src/variations/lidar.py
                   equivalent) as a pure pytree.
  - ``core``     : losses, fused render step, jitted tracking and bundle-
                   adjustment loops, and the single-process SLAM pipeline
                   (src/criterion.py, render_helpers.py, tracking.py,
                   mapping.py, nerfloam.py equivalents).
  - ``data``     : KITTI / MaiCity / Newer College readers with ground
                   segmentation (src/dataset/* + patchwork++ equivalents).
  - ``parallel`` : jax.sharding multi-chip layouts (ray-DP, decoder-TP,
                   subscene sharding).
  - ``utils``    : config, logging, PLY/pose output, profiling, checkpoints.
"""

__version__ = "0.1.0"
