"""Marching tetrahedra isosurface extraction, fully vectorized on device.

Replaces both meshing paths of the reference: the runtime per-voxel skimage
CPU loop (/root/reference/src/utils/mesh_util.py:145-169 — a Python loop
over ~1e5 voxels at finalization) and the vendored-but-never-imported CUDA
marching cubes (third_party/marching_cubes, see SURVEY §2.2).

Design: each grid cell is split into 6 Kuhn tetrahedra sharing the main
diagonal (corner 0 -> corner 7). The Kuhn split is translation-consistent —
face diagonals match between neighboring cells — so the surface is
watertight across cells AND across voxels (shared corner embeddings give
identical SDF values on shared faces; the reference's runtime path did not
interpolate across voxels). Each tetrahedron has 16 sign cases emitting at
most 2 triangles; vertices are linear zero crossings on edges. Everything
is static-shape table lookups + gathers, vmappable over millions of cells;
compaction of the (cells, 6, 2) triangle buffer happens host-side once.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# Cube corners indexed j = x<<2 | y<<1 | z (matches ops.interp.CORNER_OFFSETS).
# Kuhn subdivision: per axis permutation p, tet = {0, e_p1, e_p1+e_p2, 7}.
TET_CORNERS = np.array(
    [
        [0, 4, 6, 7],
        [0, 4, 5, 7],
        [0, 2, 6, 7],
        [0, 2, 3, 7],
        [0, 1, 5, 7],
        [0, 1, 3, 7],
    ],
    dtype=np.int32,
)

# Tet edges: pairs of local tet-corner indices.
EDGE_PAIRS = np.array(
    [[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], dtype=np.int32
)

# For each of 16 sign cases (bit i set <=> corner i inside, sdf < 0):
# up to two triangles as triples of edge ids; -1 = unused slot.
_T = -np.ones((16, 2, 3), dtype=np.int32)
_T[1, 0] = (0, 1, 2)                       # v0 inside
_T[2, 0] = (0, 3, 4)                       # v1
_T[3] = ((1, 2, 4), (1, 4, 3))             # v0 v1
_T[4, 0] = (1, 5, 3)                       # v2
_T[5] = ((0, 2, 5), (0, 5, 3))             # v0 v2
_T[6] = ((0, 4, 5), (0, 5, 1))             # v1 v2
_T[7, 0] = (2, 4, 5)                       # v0 v1 v2
_T[8, 0] = (2, 5, 4)                       # v3
_T[9] = ((0, 1, 5), (0, 5, 4))             # v0 v3
_T[10] = ((0, 3, 5), (0, 5, 2))            # v1 v3
_T[11, 0] = (1, 3, 5)                      # v0 v1 v3
_T[12] = ((1, 4, 2), (1, 3, 4))            # v2 v3
_T[13, 0] = (0, 4, 3)                      # v0 v2 v3
_T[14, 0] = (0, 2, 1)                      # v1 v2 v3
TRI_TABLE = _T


def marching_tets_cells(cell_pos: jnp.ndarray, cell_val: jnp.ndarray):
    """Triangles for N cells.

    cell_pos: (N, 8, 3) world positions of cube corners (j = x<<2|y<<1|z),
    cell_val: (N, 8) SDF values at those corners.
    Returns (tris (N, 12, 3, 3), valid (N, 12)) — up to 6 tets x 2 triangles
    per cell; compact host-side with the mask.
    """
    tc = jnp.asarray(TET_CORNERS)            # (6, 4)
    ep = jnp.asarray(EDGE_PAIRS)             # (6, 2)
    table = jnp.asarray(TRI_TABLE)           # (16, 2, 3)

    vals = cell_val[:, tc]                   # (N, 6, 4)
    pos = cell_pos[:, tc]                    # (N, 6, 4, 3)

    inside = (vals < 0).astype(jnp.int32)
    case = (
        inside[..., 0]
        + (inside[..., 1] << 1)
        + (inside[..., 2] << 2)
        + (inside[..., 3] << 3)
    )  # (N, 6)

    # zero crossing per tet edge
    va = jnp.take_along_axis(vals, jnp.broadcast_to(ep[None, None, :, 0], vals.shape[:2] + (6,)), axis=-1)
    vb = jnp.take_along_axis(vals, jnp.broadcast_to(ep[None, None, :, 1], vals.shape[:2] + (6,)), axis=-1)
    pa = pos[:, :, ep[:, 0]]                 # (N, 6, 6, 3)
    pb = pos[:, :, ep[:, 1]]
    denom = va - vb
    t = va / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    t = jnp.clip(t, 0.0, 1.0)
    edge_v = pa + t[..., None] * (pb - pa)   # (N, 6, 6, 3) vertex per edge

    tri_edges = table[case]                  # (N, 6, 2, 3)
    safe = jnp.clip(tri_edges, 0)
    # gather the 3 edge vertices of each candidate triangle
    tris = jnp.take_along_axis(
        edge_v[:, :, None, :, :],            # (N, 6, 1, 6edges, 3)
        jnp.broadcast_to(safe[..., None], safe.shape + (3,))[:, :, :, :, :],
        axis=3,
    )  # (N, 6, 2, 3, 3)
    valid = tri_edges[..., 0] >= 0           # (N, 6, 2)
    N = cell_pos.shape[0]
    return tris.reshape(N, 12, 3, 3), valid.reshape(N, 12)
