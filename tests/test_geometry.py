"""Geometry kernels: centroids, face centers, normals, areas, diff_mag."""
import numpy as np
import pytest

from ninpol_tpu._grid import geometry
from tests.test_topology import make_grid


def test_centroids_hexa():
    g, mesh, dim = make_grid("hexa", 4)
    # brute force vertex average
    for e in range(0, g.n_elems, 7):
        pts = g.inpoel[e][g.inpoel[e] >= 0]
        ref = mesh.points[pts].mean(axis=0)
        assert np.allclose(g.centroids[e], ref, atol=1e-14)


def test_face_centers_and_areas_hexa():
    g, mesh, dim = make_grid("hexa", 4)
    h = 1.0 / 4
    # all faces of a structured hexa grid are axis-aligned squares h x h
    assert np.allclose(g.faces_areas, h * h, rtol=1e-6)
    for f in range(0, g.n_faces, 11):
        pts = g.inpofa[f][g.inpofa[f] >= 0]
        assert np.allclose(g.faces_centers[f], mesh.points[pts].mean(axis=0),
                           atol=1e-14)


def test_normals_unit_and_float32_parity():
    g, mesh, dim = make_grid("tetra", 3)
    norms = np.linalg.norm(g.normal_faces, axis=1)
    assert np.allclose(norms, 1.0, atol=1e-6)
    # default path reproduces the reference's float32 intermediates
    # (grid.pyx:732-736): recompute in float64 and verify the default is the
    # float32-rounded version, not the float64 one
    n32, a32 = geometry.calculate_normals(g.point_coords, g.inpofa, 3,
                                          precise=False)
    n64, a64 = geometry.calculate_normals(g.point_coords, g.inpofa, 3,
                                          precise=True)
    assert np.array_equal(n32, g.normal_faces)
    # float32 and float64 differ measurably but stay within 1e-6
    assert 0 < np.abs(n32 - n64).max() < 1e-6
    assert np.allclose(a32, a64, rtol=1e-5)


def test_area_tetra_total():
    g, mesh, dim = make_grid("tetra", 2)
    # boundary of the unit cube: 6 faces, each split into 2 triangles by
    # the 6-tet decomposition -> total boundary area = 6
    b = g.boundary_faces.astype(bool)
    assert np.isclose(g.faces_areas[b].sum(), 6.0, rtol=1e-6)


def test_normals_2d():
    g, mesh, dim = make_grid("quad", 3)
    assert np.allclose(np.abs(g.normal_faces).max(axis=0), [1, 1, 0])
    assert np.allclose(np.linalg.norm(g.normal_faces[:, :2], axis=1), 1,
                       atol=1e-6)
    # 2D faces are edges: area = length = 1/3
    assert np.allclose(g.faces_areas, 1 / 3, rtol=1e-6)


def test_diff_mag():
    K = np.eye(3)[None].repeat(5, 0).reshape(5, 9)
    dm = geometry.compute_diffusion_magnitude(K)
    assert np.allclose(dm, 0.0)  # isotropic -> zero anisotropy
    K2 = np.diag([1.0, 1.0, 100.0])[None].reshape(1, 9)
    dm2 = geometry.compute_diffusion_magnitude(K2)
    det, tr = 100.0, 102.0
    assert np.isclose(dm2[0], (1 - 3 * det ** (1 / 3) / tr) ** 2)
