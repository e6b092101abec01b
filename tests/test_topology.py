"""Grid structural invariants.

The reference's grid_test.py checks these invariants but its body is
disabled by an early return (grid_test.py:60); here they actually run.
Brute-force oracles are recomputed per mesh family.
"""
import numpy as np
import pytest

from ninpol_tpu.defines import build_type_tables, TYPE_NAME_TO_INDEX, \
    MAX_POINTS_PER_ELEMENT, ELEMENT_SCHEMA
from ninpol_tpu._grid.grid import Grid
from ninpol_tpu.utils import meshgen

FAMILIES_3D = ["hexa", "tetra", "prism", "misc", "mixed"]
FAMILIES_2D = ["quad", "triangle"]


def make_grid(fam, n, build_edges=True):
    mesh = meshgen.FAMILIES[fam](n)
    dim = 2 if fam in FAMILIES_2D else 3
    tables = build_type_tables(dim)
    n_elems = sum(len(b) for b in mesh.cells)
    conn = np.full((n_elems, MAX_POINTS_PER_ELEMENT), -1, dtype=np.int64)
    et = np.full(n_elems, -1, dtype=np.int64)
    idx = 0
    for b in mesh.cells:
        t = TYPE_NAME_TO_INDEX[b.type]
        conn[idx:idx + len(b), :b.data.shape[1]] = b.data
        et[idx:idx + len(b)] = t
        idx += len(b)
    g = Grid(dim, n_elems, len(mesh.points), tables["npoel"],
             tables["nfael"], tables["lnofa"], tables["lpofa"],
             tables["nedel"], tables["lpoed"], conn, et,
             build_edges=build_edges)
    g.build()
    g.load_point_coords(mesh.points)
    g.calculate_centroids()
    g.calculate_normal_faces()
    return g, mesh, dim


@pytest.mark.parametrize("fam", FAMILIES_3D + FAMILIES_2D)
def test_esup_membership(fam):
    g, mesh, dim = make_grid(fam, 3)
    # brute force: for each element, each of its points lists it in esup
    for e in range(g.n_elems):
        pts = g.inpoel[e][g.inpoel[e] >= 0]
        for p in pts:
            elems = g.esup[g.esup_ptr[p]:g.esup_ptr[p + 1]]
            assert e in elems
    # esup per point is ascending (reference fill order)
    for p in range(g.n_points):
        elems = g.esup[g.esup_ptr[p]:g.esup_ptr[p + 1]]
        assert np.all(np.diff(elems) > 0)
        assert len(np.unique(elems)) == len(elems)


@pytest.mark.parametrize("fam", FAMILIES_3D)
def test_psup_first_occurrence_order(fam):
    g, mesh, dim = make_grid(fam, 2)
    # brute-force reference ordering (element-major, first occurrence)
    for p in range(g.n_points):
        seen = []
        for e in g.esup[g.esup_ptr[p]:g.esup_ptr[p + 1]]:
            for q in g.inpoel[e][g.inpoel[e] >= 0]:
                if q != p and q not in seen:
                    seen.append(q)
        got = list(g.psup[g.psup_ptr[p]:g.psup_ptr[p + 1]])
        assert got == seen


@pytest.mark.parametrize("fam", FAMILIES_3D + FAMILIES_2D)
def test_faces_consistent_with_schema(fam):
    g, mesh, dim = make_grid(fam, 3)
    faces_key = "edges" if dim == 2 else "faces"
    # every (element, local face) must match inpofa of its global face as a
    # set, and the face must belong to the element's schema
    for e in range(min(g.n_elems, 200)):
        t = int(g.element_types[e])
        name = [k for k, v in TYPE_NAME_TO_INDEX.items() if v == t][0]
        schema_faces = ELEMENT_SCHEMA[name][faces_key]
        for j, sf in enumerate(schema_faces):
            f = g.infael[e, j]
            assert f >= 0
            fp = set(g.inpofa[f][g.inpofa[f] >= 0])
            assert fp == {g.inpoel[e, k] for k in sf}


@pytest.mark.parametrize("fam", FAMILIES_3D)
def test_esuel_symmetry_and_counts(fam):
    g, mesh, dim = make_grid(fam, 3)
    for e in range(g.n_elems):
        for j in range(6):
            nb = g.esuel[e, j]
            if nb >= 0:
                assert e in g.esuel[nb]
    # interior faces have exactly 2 elements, boundary 1
    counts = np.diff(g.esuf_ptr)
    assert set(np.unique(counts)) <= {1, 2}
    assert np.all((counts == 1) == g.boundary_faces.astype(bool))


@pytest.mark.parametrize("fam,nb", [("hexa", 96), ("tetra", 192),
                                    ("prism", 128)])
def test_boundary_counts(fam, nb):
    g, mesh, dim = make_grid(fam, 4)
    assert g.boundary_faces.sum() == nb
    # boundary points of the unit cube = points on any face of the cube
    pts = mesh.points
    on_surface = ((pts == 0) | (pts == 1)).any(axis=1)
    assert np.array_equal(g.boundary_points.astype(bool), on_surface)


@pytest.mark.parametrize("fam", FAMILIES_3D + FAMILIES_2D)
def test_fsup_esuf_membership(fam):
    g, mesh, dim = make_grid(fam, 3)
    for f in range(g.n_faces):
        for p in g.inpofa[f][g.inpofa[f] >= 0]:
            faces = g.fsup[g.fsup_ptr[p]:g.fsup_ptr[p + 1]]
            assert f in faces
        elems = g.esuf[g.esuf_ptr[f]:g.esuf_ptr[f + 1]]
        for e in elems:
            assert f in g.infael[e]


def test_edges_hexa():
    g, mesh, dim = make_grid("hexa", 3)
    # structured hexa grid edge count: 3 * n * (n+1)^2
    n = 3
    assert g.n_edges == 3 * n * (n + 1) ** 2
    # each edge pair is a valid lattice edge
    d = np.abs(mesh.points[g.inpoed[:, 0]] - mesh.points[g.inpoed[:, 1]])
    assert np.allclose(np.sort(d, axis=1)[:, :2], 0)


def test_get_data_padded_shapes():
    g, mesh, dim = make_grid("tetra", 2)
    data = g.get_data()
    assert data["esup"].shape == (g.n_points, g.MX_ELEMENTS_PER_POINT)
    assert data["fsup"].shape == (g.n_points, g.MX_FACES_PER_POINT)
    assert data["esuf"].shape == (g.n_faces, g.MX_ELEMENTS_PER_FACE)
    # padded rows reproduce CSR
    for p in range(g.n_points):
        elems = g.esup[g.esup_ptr[p]:g.esup_ptr[p + 1]]
        row = data["esup"][p]
        assert list(row[:len(elems)]) == list(elems)
        assert np.all(row[len(elems):] == -1)


def test_grid_validation_errors():
    tables = build_type_tables(3)
    with pytest.raises(ValueError):
        Grid(0, 1, 1, tables["npoel"], tables["nfael"], tables["lnofa"],
             tables["lpofa"], tables["nedel"], tables["lpoed"],
             np.zeros((1, 8), dtype=np.int64), np.zeros(1, dtype=np.int64))
    with pytest.raises(ValueError):
        Grid(3, 0, 1, tables["npoel"], tables["nfael"], tables["lnofa"],
             tables["lpofa"], tables["nedel"], tables["lpoed"],
             np.zeros((1, 8), dtype=np.int64), np.zeros(1, dtype=np.int64))
