"""Minimal meshio-compatible mesh container and file I/O.

The reference delegates all mesh-format parsing to the external ``meshio``
package (reference: ninpol/_interpolator/interpolator.pyx:188, setup.py:124).
That package is not available in this environment, so this module provides:

  * :class:`CellBlock` / :class:`Mesh` — duck-typed stand-ins exposing the
    subset of the meshio API the framework and its tests use
    (``points``, ``cells``, ``cells_dict``, ``cell_data``, ``cell_data_dict``,
    ``point_data``).
  * :func:`read` — parsers for Gmsh ``.msh`` (ASCII v2.2 / v4.1) and legacy
    VTK ``.vtk`` (ASCII unstructured grid), the formats used by the
    reference's test meshes (tests/mesh/*.msh, *.vtk).
  * :func:`write` — matching ASCII writers.

If a real ``meshio`` is importable it is preferred transparently (see
:func:`read`), so user code keeps working with either.
"""
from __future__ import annotations

import numpy as np

try:  # pragma: no cover - exercised only when meshio is installed
    import meshio as _meshio
except ImportError:  # pragma: no cover
    _meshio = None

# Gmsh element-type ids -> (meshio type name, nodes per element)
_GMSH_TYPES = {
    15: ("vertex", 1),
    1: ("line", 2),
    2: ("triangle", 3),
    3: ("quad", 4),
    4: ("tetra", 4),
    5: ("hexahedron", 8),
    6: ("wedge", 6),
    7: ("pyramid", 5),
}
_GMSH_TYPE_IDS = {v[0]: k for k, v in _GMSH_TYPES.items()}

# VTK cell-type ids -> (meshio type name, nodes per element)
_VTK_TYPES = {
    1: ("vertex", 1),
    3: ("line", 2),
    5: ("triangle", 3),
    9: ("quad", 4),
    10: ("tetra", 4),
    12: ("hexahedron", 8),
    13: ("wedge", 6),
    14: ("pyramid", 5),
}
_VTK_TYPE_IDS = {v[0]: k for k, v in _VTK_TYPES.items()}


class CellBlock:
    """One homogeneous block of cells (mirrors meshio.CellBlock)."""

    def __init__(self, cell_type: str, data):
        self.type = cell_type
        self.data = np.asarray(data, dtype=np.int64)

    def __len__(self):
        return len(self.data)

    def __iter__(self):
        return iter((self.type, self.data))

    def __repr__(self):
        return f"<CellBlock {self.type}: {len(self.data)} cells>"


class Mesh:
    """Duck-typed meshio.Mesh replacement."""

    def __init__(self, points, cells, point_data=None, cell_data=None):
        self.points = np.asarray(points, dtype=np.float64)
        norm_cells = []
        for block in cells:
            if isinstance(block, CellBlock):
                norm_cells.append(block)
            elif _meshio is not None and isinstance(
                    block, getattr(_meshio, "CellBlock", ())):
                norm_cells.append(CellBlock(block.type, block.data))
            else:  # (type, data) tuple
                norm_cells.append(CellBlock(block[0], block[1]))
        self.cells = norm_cells
        self.point_data = dict(point_data or {})
        # cell_data: {var: [array_per_block, ...]} (meshio convention)
        self.cell_data = {
            k: [np.asarray(b) for b in v] for k, v in (cell_data or {}).items()
        }

    @property
    def cells_dict(self):
        out = {}
        for block in self.cells:
            if block.type in out:
                out[block.type] = np.concatenate(
                    [out[block.type], block.data], axis=0)
            else:
                out[block.type] = block.data
        return out

    @property
    def cell_data_dict(self):
        """{var: {cell_type: concatenated array}} (meshio convention)."""
        out = {}
        for var, blocks in self.cell_data.items():
            per_type = {}
            for block, arr in zip(self.cells, blocks):
                if block.type in per_type:
                    per_type[block.type] = np.concatenate(
                        [per_type[block.type], np.asarray(arr)], axis=0)
                else:
                    per_type[block.type] = np.asarray(arr)
            out[var] = per_type
        return out

    def __repr__(self):
        parts = ", ".join(f"{b.type}:{len(b)}" for b in self.cells)
        return f"<Mesh {len(self.points)} points, [{parts}]>"


def as_local_mesh(mesh) -> Mesh:
    """Normalize any meshio-like object into a local :class:`Mesh`."""
    if isinstance(mesh, Mesh):
        return mesh
    cell_data = getattr(mesh, "cell_data", {}) or {}
    return Mesh(mesh.points, mesh.cells, getattr(mesh, "point_data", {}),
                cell_data)


# ---------------------------------------------------------------------------
# Readers
# ---------------------------------------------------------------------------

def read(filename: str) -> Mesh:
    """Read a mesh file. Prefers real meshio when installed."""
    if _meshio is not None:
        return as_local_mesh(_meshio.read(filename))
    name = str(filename).lower()
    if name.endswith(".msh"):
        return _read_gmsh(filename)
    if name.endswith(".vtk"):
        return _read_vtk(filename)
    raise ValueError(
        f"Unsupported mesh format for '{filename}' "
        "(built-in readers: .msh ASCII v2.2/v4.1, .vtk legacy ASCII; "
        "install meshio for other formats)")


def _read_gmsh(filename: str) -> Mesh:
    with open(filename) as f:
        lines = f.read().split("\n")
    i = 0
    version = None
    points = None
    blocks: dict[str, list] = {}
    n = len(lines)
    while i < n:
        line = lines[i].strip()
        if line == "$MeshFormat":
            version = float(lines[i + 1].split()[0])
            i += 1
        elif line == "$Nodes":
            if version is not None and version >= 4.0:
                i, points = _gmsh4_nodes(lines, i + 1)
            else:
                i, points = _gmsh2_nodes(lines, i + 1)
        elif line == "$Elements":
            if version is not None and version >= 4.0:
                i, blocks = _gmsh4_elements(lines, i + 1)
            else:
                i, blocks = _gmsh2_elements(lines, i + 1)
        i += 1
    if points is None:
        raise ValueError(f"No $Nodes section in {filename}")
    cells = [CellBlock(t, np.asarray(d, dtype=np.int64))
             for t, d in blocks.items()]
    return Mesh(points, cells)


def _gmsh2_nodes(lines, i):
    n_nodes = int(lines[i].split()[0])
    pts = np.empty((n_nodes, 3), dtype=np.float64)
    idx = np.empty(n_nodes, dtype=np.int64)
    for k in range(n_nodes):
        parts = lines[i + 1 + k].split()
        idx[k] = int(parts[0])
        pts[k] = [float(parts[1]), float(parts[2]), float(parts[3])]
    # gmsh node tags may be non-contiguous; remap to 0-based dense
    order = np.argsort(idx)
    pts = pts[order]
    return i + n_nodes + 1, pts


def _gmsh2_elements(lines, i):
    n_elems = int(lines[i].split()[0])
    blocks: dict[str, list] = {}
    for k in range(n_elems):
        parts = lines[i + 1 + k].split()
        etype = int(parts[1])
        if etype not in _GMSH_TYPES:
            continue
        name, npts = _GMSH_TYPES[etype]
        ntags = int(parts[2])
        conn = [int(p) - 1 for p in parts[3 + ntags:3 + ntags + npts]]
        blocks.setdefault(name, []).append(conn)
    return i + n_elems + 1, blocks


def _gmsh4_nodes(lines, i):
    header = lines[i].split()
    num_blocks, n_nodes = int(header[0]), int(header[1])
    pts = np.empty((n_nodes, 3), dtype=np.float64)
    tags = np.empty(n_nodes, dtype=np.int64)
    i += 1
    filled = 0
    for _ in range(num_blocks):
        blk = lines[i].split()
        nb = int(blk[3])
        for k in range(nb):
            tags[filled + k] = int(lines[i + 1 + k])
        for k in range(nb):
            xyz = lines[i + 1 + nb + k].split()
            pts[filled + k] = [float(xyz[0]), float(xyz[1]), float(xyz[2])]
        filled += nb
        i += 1 + 2 * nb
    order = np.argsort(tags)
    remap = np.empty(tags.max() + 1, dtype=np.int64)
    remap[tags[order]] = np.arange(n_nodes)
    _gmsh4_nodes.remap = remap  # used by _gmsh4_elements
    return i - 1, pts[order]


def _gmsh4_elements(lines, i):
    header = lines[i].split()
    num_blocks = int(header[0])
    blocks: dict[str, list] = {}
    remap = getattr(_gmsh4_nodes, "remap", None)
    i += 1
    for _ in range(num_blocks):
        blk = lines[i].split()
        etype, nb = int(blk[2]), int(blk[3])
        for k in range(nb):
            parts = lines[i + 1 + k].split()
            if etype in _GMSH_TYPES:
                name, npts = _GMSH_TYPES[etype]
                conn = [int(p) for p in parts[1:1 + npts]]
                if remap is not None:
                    conn = [int(remap[c]) for c in conn]
                else:
                    conn = [c - 1 for c in conn]
                blocks.setdefault(name, []).append(conn)
        i += 1 + nb
    return i - 1, blocks


def _read_vtk(filename: str) -> Mesh:
    with open(filename) as f:
        tokens_lines = f.read().split("\n")
    # tokenize lazily section by section
    i = 0
    n = len(tokens_lines)
    points = None
    conn_flat = None
    offsets = None
    types = None
    point_data: dict[str, np.ndarray] = {}
    cell_data_flat: dict[str, np.ndarray] = {}
    section = None
    n_points = n_cells = 0
    while i < n:
        parts = tokens_lines[i].split()
        if not parts:
            i += 1
            continue
        key = parts[0].upper()
        if key == "POINTS":
            n_points = int(parts[1])
            vals, i = _vtk_read_floats(tokens_lines, i + 1, n_points * 3)
            points = vals.reshape(n_points, 3)
            continue
        if key == "CELLS":
            n_cells = int(parts[1])
            total = int(parts[2])
            vals, i = _vtk_read_floats(tokens_lines, i + 1, total)
            raw = vals.astype(np.int64)
            # raw layout: [npts, p0..pk, npts, ...]
            conn_flat, offsets = [], [0]
            j = 0
            while j < len(raw):
                cnt = int(raw[j])
                conn_flat.extend(raw[j + 1:j + 1 + cnt].tolist())
                offsets.append(offsets[-1] + cnt)
                j += 1 + cnt
            conn_flat = np.asarray(conn_flat, dtype=np.int64)
            continue
        if key == "CELL_TYPES":
            cnt = int(parts[1])
            vals, i = _vtk_read_floats(tokens_lines, i + 1, cnt)
            types = vals.astype(np.int64)
            continue
        if key == "POINT_DATA":
            section = "point"
            i += 1
            continue
        if key == "CELL_DATA":
            section = "cell"
            i += 1
            continue
        if key in ("SCALARS", "VECTORS", "TENSORS", "FIELD"):
            if key == "FIELD":
                n_arrays = int(parts[2])
                i += 1
                for _ in range(n_arrays):
                    fparts = tokens_lines[i].split()
                    name, ncomp, ntup = fparts[0], int(fparts[1]), int(fparts[2])
                    vals, i = _vtk_read_floats(tokens_lines, i + 1, ncomp * ntup)
                    arr = vals.reshape(ntup, ncomp) if ncomp > 1 else vals
                    (point_data if section == "point" else
                     cell_data_flat)[name] = arr
                continue
            name = parts[1]
            ncomp = {"SCALARS": 1, "VECTORS": 3, "TENSORS": 9}[key]
            if key == "SCALARS" and len(parts) >= 4:
                ncomp = int(parts[3])
            count = (n_points if section == "point" else n_cells) * ncomp
            j = i + 1
            if key == "SCALARS" and tokens_lines[j].split()[:1] == ["LOOKUP_TABLE"]:
                j += 1
            vals, i = _vtk_read_floats(tokens_lines, j, count)
            arr = vals.reshape(-1, ncomp) if ncomp > 1 else vals
            (point_data if section == "point" else cell_data_flat)[name] = arr
            continue
        i += 1

    if points is None or types is None:
        raise ValueError(f"Malformed VTK file {filename}")

    # group cells by type, preserving original order within each type
    blocks = []
    order_per_type: dict[str, np.ndarray] = {}
    for tid, (name, npts) in _VTK_TYPES.items():
        sel = np.nonzero(types == tid)[0]
        if len(sel) == 0:
            continue
        conn = np.stack([
            conn_flat[offsets[s]:offsets[s + 1]] for s in sel
        ])
        blocks.append(CellBlock(name, conn))
        order_per_type[name] = sel
    cell_data = {}
    for var, arr in cell_data_flat.items():
        cell_data[var] = [np.asarray(arr)[order_per_type[b.type]]
                         for b in blocks]
    return Mesh(points, blocks, point_data, cell_data)


def _vtk_read_floats(lines, i, count):
    vals = []
    while len(vals) < count:
        vals.extend(float(t) for t in lines[i].split())
        i += 1
    return np.asarray(vals[:count], dtype=np.float64), i


# ---------------------------------------------------------------------------
# Writers
# ---------------------------------------------------------------------------

def write(filename: str, mesh: Mesh) -> None:
    name = str(filename).lower()
    if name.endswith(".msh"):
        _write_gmsh2(filename, mesh)
    elif name.endswith(".vtk"):
        _write_vtk(filename, mesh)
    else:
        raise ValueError(f"Unsupported output format for '{filename}'")


def _write_gmsh2(filename: str, mesh: Mesh) -> None:
    with open(filename, "w") as f:
        f.write("$MeshFormat\n2.2 0 8\n$EndMeshFormat\n$Nodes\n")
        f.write(f"{len(mesh.points)}\n")
        for i, p in enumerate(mesh.points):
            f.write(f"{i + 1} {p[0]:.17g} {p[1]:.17g} {p[2]:.17g}\n")
        f.write("$EndNodes\n$Elements\n")
        n_elems = sum(len(b) for b in mesh.cells)
        f.write(f"{n_elems}\n")
        eid = 1
        for block in mesh.cells:
            tid = _GMSH_TYPE_IDS[block.type]
            for cell in block.data:
                conn = " ".join(str(c + 1) for c in cell)
                f.write(f"{eid} {tid} 2 0 0 {conn}\n")
                eid += 1
        f.write("$EndElements\n")


def _write_vtk(filename: str, mesh: Mesh) -> None:
    with open(filename, "w") as f:
        f.write("# vtk DataFile Version 3.0\nninpol_tpu mesh\nASCII\n")
        f.write("DATASET UNSTRUCTURED_GRID\n")
        f.write(f"POINTS {len(mesh.points)} double\n")
        for p in mesh.points:
            f.write(f"{p[0]:.17g} {p[1]:.17g} {p[2]:.17g}\n")
        n_cells = sum(len(b) for b in mesh.cells)
        total = sum(len(b) * (b.data.shape[1] + 1) for b in mesh.cells)
        f.write(f"CELLS {n_cells} {total}\n")
        for block in mesh.cells:
            for cell in block.data:
                f.write(f"{len(cell)} " + " ".join(map(str, cell)) + "\n")
        f.write(f"CELL_TYPES {n_cells}\n")
        for block in mesh.cells:
            tid = _VTK_TYPE_IDS[block.type]
            f.write((f"{tid}\n") * len(block))

        def _write_field(name, arr):
            arr = np.asarray(arr, dtype=np.float64)
            ncomp = arr.shape[1] if arr.ndim > 1 else 1
            flat = arr.reshape(-1)
            f.write(f"{name} {ncomp} {len(flat) // ncomp} double\n")
            for i in range(0, len(flat), 9):
                f.write(" ".join(f"{v:.17g}" for v in flat[i:i + 9]) + "\n")

        if mesh.cell_data:
            f.write(f"CELL_DATA {n_cells}\n")
            f.write(f"FIELD FieldData {len(mesh.cell_data)}\n")
            for var, blocks in mesh.cell_data.items():
                parts = [np.atleast_2d(np.asarray(b, dtype=np.float64).T).T
                         for b in blocks]
                merged = np.concatenate(parts, axis=0)
                _write_field(var,
                             merged[:, 0] if merged.shape[1] == 1 else merged)
        if mesh.point_data:
            f.write(f"POINT_DATA {len(mesh.points)}\n")
            f.write(f"FIELD FieldData {len(mesh.point_data)}\n")
            for var, arr in mesh.point_data.items():
                _write_field(var, arr)
