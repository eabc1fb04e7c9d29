"""Marching tetrahedra correctness: sphere reconstruction + watertightness."""

import numpy as np
import jax.numpy as jnp

from nerfloam_tpu.ops.marching import marching_tets_cells, TET_CORNERS
from nerfloam_tpu.ops.interp import CORNER_OFFSETS


def _grid_cells(res, extent):
    """Dense grid of cells over [-extent, extent]^3."""
    u = np.linspace(-extent, extent, res)
    cell_pos = []
    for x in range(res - 1):
        for y in range(res - 1):
            for z in range(res - 1):
                corners = []
                for j in range(8):
                    corners.append(
                        [u[x + ((j >> 2) & 1)], u[y + ((j >> 1) & 1)], u[z + (j & 1)]]
                    )
                cell_pos.append(corners)
    return np.asarray(cell_pos, np.float32)


def test_tet_decomposition_partitions_cube():
    # 6 Kuhn tets, each volume 1/6, all share diagonal 0-7
    vols = 0.0
    for tet in TET_CORNERS:
        p = CORNER_OFFSETS[tet].astype(float)
        v = abs(np.linalg.det(p[1:] - p[0])) / 6.0
        assert v > 1e-9
        vols += v
        assert 0 in tet and 7 in tet
    np.testing.assert_allclose(vols, 1.0, atol=1e-9)


def test_sphere_reconstruction():
    r = 1.0
    cells = _grid_cells(17, 1.6)
    vals = np.linalg.norm(cells, axis=-1) - r  # exact sphere SDF at corners
    tris, valid = marching_tets_cells(jnp.asarray(cells), jnp.asarray(vals))
    tris = np.asarray(tris)[np.asarray(valid)]
    assert len(tris) > 100
    verts = tris.reshape(-1, 3)
    d = np.abs(np.linalg.norm(verts, axis=-1) - r)
    # linear interpolation on a 0.2-cell grid: all vertices near the sphere
    assert d.max() < 0.02
    # area close to 4*pi*r^2
    a = tris[:, 1] - tris[:, 0]
    b = tris[:, 2] - tris[:, 0]
    area = 0.5 * np.linalg.norm(np.cross(a, b), axis=-1).sum()
    np.testing.assert_allclose(area, 4 * np.pi, rtol=0.05)


def test_watertight_edges():
    # every edge of a closed surface must be shared by exactly 2 triangles
    r = 0.8
    cells = _grid_cells(9, 1.2)
    vals = np.linalg.norm(cells, axis=-1) - r
    tris, valid = marching_tets_cells(jnp.asarray(cells), jnp.asarray(vals))
    tris = np.asarray(tris)[np.asarray(valid)]
    flat = tris.reshape(-1, 3)
    keys = np.round(flat * 1e5).astype(np.int64)
    _, inv = np.unique(keys, axis=0, return_inverse=True)
    faces = inv.reshape(-1, 3)
    faces = faces[
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    ]
    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).mean() > 0.99


def test_flat_plane():
    cells = _grid_cells(5, 1.0)
    vals = cells[..., 2] - 0.13  # plane z = 0.13
    tris, valid = marching_tets_cells(jnp.asarray(cells), jnp.asarray(vals))
    tris = np.asarray(tris)[np.asarray(valid)]
    assert len(tris) > 0
    np.testing.assert_allclose(tris[..., 2], 0.13, atol=1e-5)


def test_clean_mesh_culls_unobserved_faces():
    """SHINE-protocol culling: faces keep iff ANY vertex has an observed
    point within voxel_size * 0.5 (reference mesh_util.py:90-102)."""
    import numpy as np
    from nerfloam_tpu.map.mesher import clean_mesh, downsample_points

    verts = np.array(
        [
            [0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0],   # observed
            [50.0, 0.0, 0.0], [51.0, 0.0, 0.0], [50.0, 1.0, 0.0],  # spurious
        ],
        np.float32,
    )
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    observed = np.array([[0.05, 0.0, 0.0]], np.float32)  # near vertex 0 only
    kept = clean_mesh(verts, faces, observed, radius=0.15)
    np.testing.assert_array_equal(kept, faces[:1])

    # radius large enough to reach the far triangle keeps both
    kept_all = clean_mesh(verts, faces, observed, radius=100.0)
    assert len(kept_all) == 2

    # downsample: 1000 points in one 5 cm cell -> 1 representative
    pts = np.random.default_rng(0).uniform(0, 0.04, (1000, 3)).astype(np.float32)
    assert len(downsample_points(pts, voxel=0.05)) == 1
    # two distant clusters -> 2
    pts2 = np.concatenate([pts, pts + 10.0])
    assert len(downsample_points(pts2, voxel=0.05)) == 2
