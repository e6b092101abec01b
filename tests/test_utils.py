"""Logger, meshgen, and df32 utility coverage."""
import os

import numpy as np
import pytest

from ninpol_tpu.utils.logger import Logger, arr_to_dict
from ninpol_tpu.utils import meshgen


def test_logger_file_mode(tmp_path):
    log = Logger("t", terminal=False, directory=str(tmp_path), logging=True)
    log.log("hello", "INFO")
    log.log("warn msg", "WARN")
    files = [f for f in os.listdir(tmp_path) if f.endswith(".log")]
    assert len(files) == 1
    content = open(tmp_path / files[0]).read()
    assert "hello" in content and "[WARN " in content
    # collision-avoiding index suffix (reference logger.pyx:38-44)
    log2 = Logger("t", terminal=False, directory=str(tmp_path), logging=True)
    log2.log("second", "INFO")
    assert len([f for f in os.listdir(tmp_path)
                if f.endswith(".log")]) == 2


def test_logger_json(tmp_path):
    log = Logger("j", terminal=False, directory=str(tmp_path), logging=True)
    log.json("metrics", {"a": np.arange(3), "nested": {"b": 1}})
    jf = [f for f in os.listdir(tmp_path) if f.endswith(".json")]
    assert len(jf) == 1
    assert '"metrics"' in open(tmp_path / jf[0]).read()


def test_logger_disabled_is_silent(capsys, tmp_path):
    log = Logger("s", terminal=True, logging=False)
    log.log("nope", "INFO")
    assert capsys.readouterr().out == ""


def test_arr_to_dict():
    assert arr_to_dict(np.array([5, 6])) == {0: 5, 1: 6}


@pytest.mark.parametrize("fam", list(meshgen.FAMILIES))
def test_meshgen_families_valid(fam):
    mesh = meshgen.FAMILIES[fam](2)
    n_pts = len(mesh.points)
    for block in mesh.cells:
        assert block.data.min() >= 0
        assert block.data.max() < n_pts
        # no degenerate cells (repeated points)
        for row in block.data[:8]:
            assert len(set(row.tolist())) == len(row)


@pytest.mark.parametrize("fam", ["hexa", "tetra", "prism", "mixed",
                                 "misc"])
def test_meshgen_families_conforming(fam):
    """Every interior face must be shared by exactly two cells: no point
    strictly inside the unit cube may be flagged boundary (a hanging
    diagonal on a shared face would surface here — the old hexa|tetra
    'mixed' family failed this)."""
    from ninpol_tpu.interpolator import Interpolator
    mesh = meshgen.FAMILIES[fam](3)
    interp = Interpolator()
    interp.load_mesh(mesh_obj=mesh)
    g = interp.grid
    coords = g.point_coords
    interior = ((coords > 1e-9) & (coords < 1 - 1e-9)).all(axis=1)
    assert not (interior & g.boundary_points.astype(bool)).any()
