"""Manufactured-solution test cases (LIN/QUAD/FAN/ALH).

Rebuild of the reference harness tests/utils/analytical.py:119-326: each
case defines an exact solution u(x,y,z) and a permeability field K; meshes
get a seeded random 50/50 Dirichlet/Neumann split of boundary faces with a
per-point majority vote, Dirichlet values from the exact solution, and
Neumann values from the sympy-derived flux -(K grad u).n evaluated at
boundary face centers and averaged onto points (analytical.py:156-212).
"""
from __future__ import annotations

import numpy as np
import sympy as sp

from ninpol_tpu._io.mesh import Mesh
from ninpol_tpu.interpolator import Interpolator


def _neumann_lambdified(expr_str):
    x, y, z = sp.symbols("x y z")
    u = sp.sympify(expr_str)
    Ks = sp.symbols("K11 K12 K13 K21 K22 K23 K31 K32 K33")
    K = sp.Matrix(3, 3, Ks)
    grad_u = sp.Matrix([sp.diff(u, v) for v in (x, y, z)])
    n1, n2, n3 = sp.symbols("n1 n2 n3")
    neu = -(K * grad_u).dot(sp.Matrix([n1, n2, n3]))
    return sp.lambdify((*Ks, n1, n2, n3, x, y, z), neu, "numpy")


def l2norm_relative(measure, reference):
    sqr = np.sum(reference ** 2)
    if sqr == 0:
        return np.nan
    return np.sqrt(np.sum((measure - reference) ** 2) / sqr)


class BaseCase:
    def __init__(self, name, expression):
        self.name = name
        self.expression = expression
        self._neu_func = _neumann_lambdified(expression)

    # subclasses define solution(x, y, z) and calculate_K(n, centroids)

    def assign_mesh_properties(self, mesh: Mesh, seed=0):
        """Attach permeability/solution cell data and boundary point data
        (analytical.py:125-231), with a seeded RNG for reproducibility."""
        interp = Interpolator()
        interp.load_mesh(mesh_obj=mesh)
        grid = interp.grid

        permeability, solution = [], []
        for block in mesh.cells:
            centroids = np.mean(mesh.points[block.data], axis=1)
            K = self.calculate_K(len(block.data), centroids)
            permeability.append(K.reshape(-1, 9))
            solution.append(self.solution(
                centroids[:, 0], centroids[:, 1], centroids[:, 2]))
        self.vols_solution = np.concatenate(solution)

        boundary = np.nonzero(np.asarray(grid.boundary_faces))[0]
        bpoints = np.unique(np.asarray(grid.inpofa)[boundary].ravel())
        self.boundary_points = bpoints[bpoints != -1]
        self.internal_points = np.setdiff1d(
            np.arange(grid.n_points), self.boundary_points)

        rng = np.random.default_rng(seed)
        ridx = rng.choice(len(boundary), len(boundary) // 2, replace=False)
        dirichlet_faces = boundary[ridx]
        neumann_faces = np.setdiff1d(boundary, dirichlet_faces)

        pv = np.zeros(grid.n_points)
        pv[self.internal_points] = np.nan
        dpts = grid.inpofa[dirichlet_faces].ravel()
        np.add.at(pv, dpts[dpts != -1], 1)
        npts = grid.inpofa[neumann_faces].ravel()
        np.add.at(pv, npts[npts != -1], -1)
        dirichlet_points = np.nonzero(pv >= 0)[0]
        neumann_points = np.nonzero(pv < 0)[0]

        dirichlet_flag = np.zeros(grid.n_points)
        dirichlet_flag[dirichlet_points] = 1
        neumann_flag = np.zeros(grid.n_points)
        neumann_flag[neumann_points] = 1

        P = np.asarray(grid.point_coords)
        dirichlet = np.zeros(grid.n_points)
        dirichlet[dirichlet_points] = self.solution(
            P[dirichlet_points, 0], P[dirichlet_points, 1],
            P[dirichlet_points, 2])

        # Neumann flux at boundary face centers, K from the face's inner
        # cell evaluated at cell centroids (analytical.py:192-212).
        owners = grid.esuf[grid.esuf_ptr[boundary]]
        Kvol = self.calculate_K(grid.n_elems, np.asarray(grid.centroids))
        Kn = Kvol.reshape(-1, 3, 3)[owners]
        nn = np.asarray(grid.normal_faces)[boundary]
        fcent = np.asarray(grid.faces_centers)[boundary]
        neumann_val_faces = np.zeros(grid.n_faces)
        neumann_val_faces[boundary] = self._neu_func(
            Kn[:, 0, 0], Kn[:, 0, 1], Kn[:, 0, 2],
            Kn[:, 1, 0], Kn[:, 1, 1], Kn[:, 1, 2],
            Kn[:, 2, 0], Kn[:, 2, 1], Kn[:, 2, 2],
            nn[:, 0], nn[:, 1], nn[:, 2],
            fcent[:, 0], fcent[:, 1], fcent[:, 2])

        # mean of neumann_val_faces over each point's fsup list, vectorized
        neumann = np.zeros(grid.n_points)
        counts = np.diff(grid.fsup_ptr)
        owner = np.repeat(np.arange(grid.n_points), counts)
        sums = np.bincount(owner, weights=neumann_val_faces[grid.fsup],
                           minlength=grid.n_points)
        means = sums / np.maximum(counts, 1)
        neumann[neumann_points] = means[neumann_points]

        self.point_solution = self.solution(P[:, 0], P[:, 1], P[:, 2])
        self.dirichlet_points = dirichlet_points

        point_data = {
            f"dirichlet_{self.name}": dirichlet,
            f"dirichlet_flag_{self.name}": dirichlet_flag,
            f"neumann_{self.name}": neumann,
            f"neumann_flag_{self.name}": neumann_flag,
        }
        cell_data = {"permeability": permeability, self.name: solution}
        self.mesh = Mesh(mesh.points, mesh.cells, point_data, cell_data)
        return self.mesh

    def evaluate(self, weights):
        """Relative L2 error over internal nodes (analytical.py:233-243)."""
        values = weights.dot(self.vols_solution)
        values[self.dirichlet_points] = \
            self.point_solution[self.dirichlet_points]
        internal = np.setdiff1d(np.arange(len(values)), self.boundary_points)
        return l2norm_relative(values[internal],
                               self.point_solution[internal])


class LINCase(BaseCase):
    def __init__(self):
        super().__init__("LIN", "x + y + z")

    def calculate_K(self, n, centroids=None):
        Ku = np.array([[1.0, 0.5, 0.0], [0.5, 1.0, 0.5], [0.0, 0.5, 1.0]])
        return np.broadcast_to(Ku, (n, 3, 3)).copy()

    def solution(self, x, y, z):
        return x + y + z


class QUADCase(BaseCase):
    def __init__(self):
        super().__init__("QUAD", "x**2 + y**2 + z**2")

    def calculate_K(self, n, centroids=None):
        Ku = np.array([[1.0, 0.5, 0.0], [0.5, 1.0, 0.5], [0.0, 0.5, 1.0]])
        return np.broadcast_to(Ku, (n, 3, 3)).copy()

    def solution(self, x, y, z):
        return x ** 2 + y ** 2 + z ** 2


class FANCase(BaseCase):
    def __init__(self):
        super().__init__(
            "FAN", "sin(2*pi*x) * sin(2*pi*y) * sin(2*pi*z)")

    def calculate_K(self, n, centroids=None):
        Ku = np.array([[2464.36, 0.0, 1148.68],
                       [0.0, 536.64, 0.0],
                       [1148.68, 0.0, 536.64]])
        return np.broadcast_to(Ku, (n, 3, 3)).copy()

    def solution(self, x, y, z):
        tp = 2 * np.pi
        return np.sin(tp * x) * np.sin(tp * y) * np.sin(tp * z)


class ALHCase(BaseCase):
    def __init__(self):
        super().__init__(
            "ALH",
            "x**3 * y**2 * z + x * sin(2*pi*x*z) * sin(2*pi*x*y) "
            "* sin(2*pi*z)")

    def calculate_K(self, n, centroids):
        K = np.zeros((n, 3, 3))
        x, y, z = centroids[:, 0], centroids[:, 1], centroids[:, 2]
        K[:, 0, 0] = y ** 2 + z ** 2 + 1
        K[:, 0, 1] = -x * y
        K[:, 0, 2] = -x * z
        K[:, 1, 0] = -y * x
        K[:, 1, 1] = x ** 2 + z ** 2 + 1
        K[:, 1, 2] = -y * z
        K[:, 2, 0] = -z * x
        K[:, 2, 1] = -z * y
        K[:, 2, 2] = x ** 2 + y ** 2 + 1
        return K

    def solution(self, x, y, z):
        tp = 2 * np.pi
        return (x ** 3 * y ** 2 * z
                + x * np.sin(tp * x * z) * np.sin(tp * x * y)
                * np.sin(tp * z))


ALL_CASES = [LINCase, QUADCase, FANCase, ALHCase]
