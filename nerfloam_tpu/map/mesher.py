"""Mesh extraction: per-voxel SDF grid eval + device marching tetrahedra.

Equivalent of the reference chain get_scores -> MeshExtractor.create_mesh /
marching_cubes (/root/reference/src/variations/render_helpers.py:97-153 and
src/utils/mesh_util.py:80-169): every surface voxel is sampled on a res^3
lattice spanning [center - vs/2, center + vs/2] (mesh_util.py:148-161
geometry) and triangulated. The reference looped skimage over voxels on the
CPU; here SDF eval and triangulation are one chunked jitted program and the
host only compacts/dedups the output buffers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from nerfloam_tpu.map import voxel_map as vm
from nerfloam_tpu.models.decoder import decoder_apply
from nerfloam_tpu.ops.interp import trilinear_weights
from nerfloam_tpu.ops.marching import marching_tets_cells


def _lattice_fractions(res: int) -> np.ndarray:
    """(res^3, 3) fractional sample positions in [0, 1]^3, x slowest."""
    u = np.linspace(0.0, 1.0, res)
    xx, yy, zz = np.meshgrid(u, u, u, indexing="ij")
    return np.stack([xx, yy, zz], -1).reshape(-1, 3).astype(np.float32)


def _cell_corner_table(res: int) -> np.ndarray:
    """((res-1)^3, 8) indices into the res^3 lattice; corner j = x<<2|y<<1|z."""
    n = res - 1
    idx = np.arange(res**3).reshape(res, res, res)
    cells = []
    for x in range(n):
        for y in range(n):
            for z in range(n):
                c = [idx[x + ((j >> 2) & 1), y + ((j >> 1) & 1), z + (j & 1)]
                     for j in range(8)]
                cells.append(c)
    return np.asarray(cells, np.int32)


@functools.partial(
    jax.jit, static_argnames=("map_cfg", "decoder_meta", "res", "compute_dtype")
)
def _mesh_chunk(
    map_state: vm.MapState,
    map_cfg: vm.MapConfig,
    decoder_params,
    decoder_meta,
    voxel_ids: jnp.ndarray,   # (B,) lattice ids of surface voxels (pad: -1)
    res: int,
    compute_dtype: str = "float32",
):
    B = voxel_ids.shape[0]
    dt = jnp.dtype(compute_dtype)
    safe = jnp.clip(voxel_ids, 0)
    cidx = map_state.corner_idx[safe]                    # (B, 8)
    embs = map_state.embeddings[jnp.clip(cidx, 0)].astype(jnp.float32)  # (B,8,F)

    fr = jnp.asarray(_lattice_fractions(res))            # (S, 3)
    w = trilinear_weights(fr)                            # (S, 8)
    feats = jnp.einsum("sc,bcf->bsf", w, embs)           # (B, S, F)
    sdf = decoder_apply(decoder_params, decoder_meta, feats, dt)[..., 0]  # (B,S)

    vs = map_cfg.voxel_size
    base = map_state.lat_coords[safe].astype(jnp.float32) * vs  # voxel min corner
    pos = base[:, None, :] + fr[None] * vs               # (B, S, 3)

    cct = jnp.asarray(_cell_corner_table(res))           # (Ncell, 8)
    cell_val = sdf[:, cct]                               # (B, Ncell, 8)
    cell_pos = pos[:, cct]                               # (B, Ncell, 8, 3)
    ncell = cct.shape[0]
    tris, valid = marching_tets_cells(
        cell_pos.reshape(B * ncell, 8, 3), cell_val.reshape(B * ncell, 8)
    )
    valid = valid & (voxel_ids.repeat(ncell)[:, None] >= 0)
    return tris, valid


def extract_mesh(
    map_state: vm.MapState,
    map_cfg: vm.MapConfig,
    decoder_params,
    decoder_meta,
    res: int = 2,
    chunk: int = 4096,
    compute_dtype: str = "float32",
):
    """Triangle mesh of the whole map. Returns (vertices (V,3), faces (F,3)).

    ``res`` matches the reference's mesh_res (2 in all LiDAR configs —
    corner-only sampling, one cell per voxel).
    """
    snap = vm.surface_snapshot(map_state)
    ids = snap["voxel_ids"]
    if len(ids) == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)

    all_tris, all_valid = [], []
    for i in range(0, len(ids), chunk):
        part = ids[i : i + chunk]
        padded = np.full(chunk, -1, np.int32)
        padded[: len(part)] = part
        tris, valid = _mesh_chunk(
            map_state, map_cfg, decoder_params, decoder_meta,
            jnp.asarray(padded), res, compute_dtype,
        )
        v = np.asarray(valid)
        t = np.asarray(tris)[v]
        all_tris.append(t)
    tris = np.concatenate(all_tris, 0)  # (T, 3, 3)
    if len(tris) == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)

    # weld duplicate vertices: quantize relative to the mesh min corner and
    # dedup on ONE int64 lattice key (ops/keys.weld_key_np) — duplicate
    # verts across cells/chunks are bitwise equal (same corner values, same
    # arithmetic), so any quantum well under voxel_size welds exactly; the
    # quantum only coarsens past 1e-4 m when the scene outgrows the 21-bit
    # key range (~210 m at 1e-4; ~2 mm at KITTI-highway 4 km extents)
    from nerfloam_tpu.ops.keys import COORD_MASK, weld_key_np

    flat = tris.reshape(-1, 3)
    vmin = flat.min(axis=0)
    span = float((flat.max(axis=0) - vmin).max())
    quantum = max(1e-4, span / (COORD_MASK - 1))
    keys = np.round((flat - vmin) / quantum).astype(np.int64)
    _, first_idx, inverse = np.unique(
        weld_key_np(keys), return_index=True, return_inverse=True
    )
    verts = flat[first_idx]
    faces = inverse.reshape(-1, 3).astype(np.int32)
    # drop degenerate faces
    good = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    return verts.astype(np.float32), faces[good]


def downsample_points(points: np.ndarray, voxel: float = 0.05) -> np.ndarray:
    """Voxel-grid downsample (one representative point per cell) — the
    numpy equivalent of the reference's o3d voxel_down_sample
    (mesh_util.py:22-26), used to bound the KD-tree size in
    :func:`clean_mesh`."""
    if len(points) == 0:
        return points
    from nerfloam_tpu.ops.keys import COORD_MASK, weld_key_np

    pmin = points.min(axis=0)
    span = float((points.max(axis=0) - pmin).max())
    voxel = max(voxel, span / (COORD_MASK - 1))  # keep keys in 21 bits/axis
    cells = np.floor((points - pmin) / voxel).astype(np.int64)
    _, first = np.unique(weld_key_np(cells), return_index=True)
    return points[first]


def clean_mesh(
    verts: np.ndarray,
    faces: np.ndarray,
    observed_points: np.ndarray,
    radius: float,
) -> np.ndarray:
    """SHINE-protocol mesh culling: keep only faces with at least one vertex
    within ``radius`` of an observed point (the reference's clean_mseh path,
    /root/reference/src/utils/mesh_util.py:90-102: cKDTree ball query at
    voxel_size * 0.5, face kept if ANY vertex has a neighbor).

    Returns the filtered faces array (vertices are left untouched; unused
    vertices are harmless in PLY output and keep face indices stable).
    """
    if len(faces) == 0 or len(observed_points) == 0:
        return faces
    from scipy.spatial import cKDTree

    kdtree = cKDTree(observed_points)
    n_near = kdtree.query_ball_point(
        verts, radius, workers=-1, return_length=True
    )
    point_mask = np.asarray(n_near) > 0
    face_mask = point_mask[faces.reshape(-1)].reshape(-1, 3).any(-1)
    return faces[face_mask]
