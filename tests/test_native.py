"""Native C++ topology engine vs the NumPy reference implementation."""
import numpy as np
import pytest

from ninpol_tpu import native
from ninpol_tpu._grid import topology
from tests.test_topology import make_grid


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native build unavailable")


@pytest.mark.parametrize("fam", ["hexa", "tetra", "prism", "misc", "mixed",
                                 "quad", "triangle"])
def test_native_matches_numpy(fam, monkeypatch):
    g_native, mesh, dim = make_grid(fam, 3)

    monkeypatch.setattr(native, "available", lambda: False)
    g_numpy, _, _ = make_grid(fam, 3)

    assert g_native.n_faces == g_numpy.n_faces
    assert g_native.n_edges == g_numpy.n_edges
    for attr in ("esup_ptr", "esup", "psup_ptr", "psup", "infael", "inpofa",
                 "esuel", "boundary_faces", "boundary_points", "fsup_ptr",
                 "fsup", "esuf_ptr", "esuf", "inedel", "inpoed"):
        a = getattr(g_native, attr)
        b = getattr(g_numpy, attr)
        assert np.array_equal(a, b), attr
