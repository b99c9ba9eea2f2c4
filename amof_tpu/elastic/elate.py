"""
Tensorial analysis of elastic constants (ELATE-equivalent).

Behavior parity with the vendored ELATE fork at amof/elastic/elate.py
(itself coudertlab/elate): the ``Elastic`` class parses/symmetrizes a
6x6 stiffness matrix (:563-635), exposes directional moduli
``Young``/``LC``/``shear``/``Poisson`` (:655-693), closed-form
Voigt/Reuss/Hill ``averages()`` (:695-714), and scipy-based 2D/3D
extremal searches (:716-748). Only the analysis core is reproduced —
the reference file's HTML/plotly report generation and Materials
Project query (~60% of it) are not on the amof path (SURVEY.md §2 row
11) and are intentionally out of scope.

Implementation is our own: the rank-4 compliance tensor is built once
and all directional moduli are einsum contractions instead of
quadruple Python loops, so they vectorize over direction grids.
"""

from __future__ import annotations

import json

import numpy as np
from scipy import optimize

VOIGT_MAP = np.array([[0, 5, 4], [5, 1, 3], [4, 3, 2]])


def dir_vec(theta, phi):
    """Unit vector from spherical angles."""
    return np.array(
        [
            np.sin(theta) * np.cos(phi),
            np.sin(theta) * np.sin(phi),
            np.cos(theta),
        ]
    )


def dir_vec2(theta, phi, chi):
    """Unit vector orthogonal to dir_vec(theta, phi), parametrized by chi."""
    return np.array(
        [
            np.cos(theta) * np.cos(phi) * np.cos(chi) - np.sin(phi) * np.sin(chi),
            np.cos(theta) * np.sin(phi) * np.cos(chi) + np.cos(phi) * np.sin(chi),
            -np.sin(theta) * np.cos(chi),
        ]
    )


def _parse_matrix(s):
    """Accept a 6x6 array-like, a JSON string, or a 6-line text matrix
    (upper/lower triangular accepted)."""
    if s is None or (isinstance(s, str) and not s.strip()):
        raise ValueError("no matrix was provided")
    if isinstance(s, str):
        try:
            loaded = json.loads(s)
            if isinstance(loaded, list):
                s = loaded
        except (json.JSONDecodeError, ValueError):
            pass
    if isinstance(s, str):
        s = s.replace("|", " ").replace("(", " ").replace(")", " ")
        lines = [line for line in s.split("\n") if line.strip()]
        if len(lines) != 6:
            raise ValueError("should have six rows")
        rows = [list(map(float, line.split())) for line in lines]
    else:
        rows = [list(map(float, row)) for row in np.asarray(s, dtype=object)]

    lens = list(map(len, rows))
    if lens == [6, 5, 4, 3, 2, 1]:  # upper triangular
        rows = [[0.0] * i + rows[i] for i in range(6)]
    elif lens == [1, 2, 3, 4, 5, 6]:  # lower triangular
        rows = [rows[i] + [0.0] * (5 - i) for i in range(6)]
    mat = np.array(rows, dtype=np.float64)
    if mat.shape != (6, 6):
        raise ValueError("should be a square matrix")

    if np.linalg.norm(np.tril(mat, -1)) == 0:
        mat = mat + np.triu(mat, 1).T
    elif np.linalg.norm(np.triu(mat, 1)) == 0:
        mat = mat + np.tril(mat, -1).T
    if np.linalg.norm(mat - mat.T) > 1e-3:
        raise ValueError("should be symmetric, or triangular")
    return 0.5 * (mat + mat.T)



def _scalar(v) -> float:
    """float() of a scalar or 1-element array (scipy optimizers hand
    back shape-(1,) x; float(ndarray) with ndim>0 is a TypeError in
    future NumPy — ADVICE r1)."""
    return float(np.asarray(v).reshape(-1)[0])

class Elastic:
    """A 6x6 stiffness matrix with directional-property analysis."""

    def __init__(self, s):
        self.CVoigt = _parse_matrix(s)
        try:
            self.SVoigt = np.linalg.inv(self.CVoigt)
        except np.linalg.LinAlgError:
            raise ValueError("matrix is singular")
        # rank-4 compliance tensor with Voigt weighting
        coeff = np.array([1.0, 1.0, 1.0, 0.5, 0.5, 0.5])
        S = np.empty((3, 3, 3, 3))
        for i in range(3):
            for j in range(3):
                for k in range(3):
                    for l in range(3):
                        p, q = VOIGT_MAP[i, j], VOIGT_MAP[k, l]
                        S[i, j, k, l] = coeff[p] * coeff[q] * self.SVoigt[p, q]
        self.Smat = S

    # -- symmetry predicates --------------------------------------------
    def is_orthorhombic(self, tol=1e-3):
        C = self.CVoigt
        off = [C[0, 3], C[0, 4], C[0, 5], C[1, 3], C[1, 4], C[1, 5],
               C[2, 3], C[2, 4], C[2, 5], C[3, 4], C[3, 5], C[4, 5]]
        return all(abs(x) < tol for x in off)

    def is_cubic(self, tol=1e-3):
        C = self.CVoigt
        return self.is_orthorhombic(tol) and all(
            abs(x) < tol
            for x in [C[0, 0] - C[1, 1], C[0, 0] - C[2, 2],
                      C[3, 3] - C[4, 4], C[3, 3] - C[5, 5],
                      C[0, 1] - C[0, 2], C[0, 1] - C[1, 2]]
        )

    # camelCase aliases matching the ELATE API
    isOrthorhombic = is_orthorhombic
    isCubic = is_cubic

    # -- directional moduli ----------------------------------------------
    def Young(self, x):
        """Young's modulus along angles x = (theta, phi)."""
        a = dir_vec(x[0], x[1])
        r = np.einsum("i,j,k,l,ijkl->", a, a, a, a, self.Smat)
        return 1.0 / r

    def Young_2(self, theta, phi):
        return self.Young((theta, phi))

    def LC(self, x):
        """Linear compressibility along x (TPa^-1)."""
        a = dir_vec(x[0], x[1])
        r = np.einsum("i,j,ijkk->", a, a, self.Smat)
        return 1000.0 * r

    def LC_2(self, theta, phi):
        return self.LC((theta, phi))

    def shear(self, x):
        """Shear modulus in plane (theta, phi) along chi = x[2]."""
        a = dir_vec(x[0], x[1])
        b = dir_vec2(x[0], x[1], x[2])
        r = np.einsum("i,j,k,l,ijkl->", a, b, a, b, self.Smat)
        return 1.0 / (4.0 * r)

    def Poisson(self, x):
        """Poisson's ratio for load (theta, phi) and transverse chi."""
        a = dir_vec(x[0], x[1])
        b = dir_vec2(x[0], x[1], x[2])
        r1 = np.einsum("i,j,k,l,ijkl->", a, a, b, b, self.Smat)
        r2 = np.einsum("i,j,k,l,ijkl->", a, a, a, a, self.Smat)
        return -r1 / r2

    # -- polycrystalline averages ----------------------------------------
    def averages(self):
        """[[K, E, G, nu] for Voigt, Reuss, Hill] (GPa, ratio)."""
        C, S = self.CVoigt, self.SVoigt
        A = (C[0, 0] + C[1, 1] + C[2, 2]) / 3
        B = (C[1, 2] + C[0, 2] + C[0, 1]) / 3
        Cc = (C[3, 3] + C[4, 4] + C[5, 5]) / 3
        a = (S[0, 0] + S[1, 1] + S[2, 2]) / 3
        b = (S[1, 2] + S[0, 2] + S[0, 1]) / 3
        c = (S[3, 3] + S[4, 4] + S[5, 5]) / 3

        KV = (A + 2 * B) / 3
        GV = (A - B + 3 * Cc) / 5
        KR = 1 / (3 * a + 6 * b)
        GR = 5 / (4 * a - 4 * b + 3 * c)
        KH = (KV + KR) / 2
        GH = (GV + GR) / 2

        def row(K, G):
            E = 1 / (1 / (3 * G) + 1 / (9 * K))
            nu = (1 - 3 * G / (3 * K + G)) / 2
            return [K, E, G, nu]

        return [row(KV, GV), row(KR, GR), row(KH, GH)]

    # -- extremal searches -------------------------------------------------
    def shear2D(self, x):
        """(min, max) shear over chi for fixed (theta, phi)."""
        r1 = optimize.minimize(
            lambda z: self.shear([x[0], x[1], _scalar(z)]), np.pi / 2,
            method="Powell", options={"xtol": 0.01, "ftol": 0.001},
        )
        r2 = optimize.minimize(
            lambda z: -self.shear([x[0], x[1], _scalar(z)]), np.pi / 2,
            method="Powell", options={"xtol": 0.01, "ftol": 0.001},
        )
        return _scalar(r1.fun), -_scalar(r2.fun)

    def shear3D(self, theta, phi, guess1=np.pi / 2, guess2=np.pi / 2):
        r1 = optimize.minimize(
            lambda z: self.shear([theta, phi, _scalar(z)]), guess1,
            method="COBYLA", options={"tol": 0.005},
        )
        r2 = optimize.minimize(
            lambda z: -self.shear([theta, phi, _scalar(z)]), guess2,
            method="COBYLA", options={"tol": 0.005},
        )
        return _scalar(r1.fun), -_scalar(r2.fun), _scalar(r1.x), _scalar(r2.x)

    def Poisson2D(self, x):
        """(min_neg, min_pos_clamped, max) Poisson over chi."""
        r1 = optimize.minimize(
            lambda z: self.Poisson([x[0], x[1], _scalar(z)]), np.pi / 2,
            method="Powell", options={"xtol": 0.01, "ftol": 0.001},
        )
        r2 = optimize.minimize(
            lambda z: -self.Poisson([x[0], x[1], _scalar(z)]), np.pi / 2,
            method="Powell", options={"xtol": 0.01, "ftol": 0.001},
        )
        return min(0.0, _scalar(r1.fun)), max(0.0, _scalar(r1.fun)), -_scalar(r2.fun)

    def poisson3D(self, theta, phi, guess1=np.pi / 2, guess2=np.pi / 2):
        r1 = optimize.minimize(
            lambda z: self.Poisson([theta, phi, _scalar(z)]), guess1,
            method="COBYLA", options={"tol": 0.005},
        )
        r2 = optimize.minimize(
            lambda z: -self.Poisson([theta, phi, _scalar(z)]), guess2,
            method="COBYLA", options={"tol": 0.005},
        )
        return (
            min(0.0, _scalar(r1.fun)), max(0.0, _scalar(r1.fun)),
            -_scalar(r2.fun), _scalar(r1.x), _scalar(r2.x),
        )

    # -- global extrema over direction grids ------------------------------
    def extrema(self, prop="Young", n_theta=60, n_phi=120):
        """(min, max) of a directional property over a sphere grid —
        vectorized counterpart of ELATE's brute-force minimize."""
        thetas = np.linspace(0, np.pi, n_theta)
        phis = np.linspace(0, 2 * np.pi, n_phi, endpoint=False)
        tg, pg = np.meshgrid(thetas, phis, indexing="ij")
        a = np.stack(
            [np.sin(tg) * np.cos(pg), np.sin(tg) * np.sin(pg), np.cos(tg)],
            axis=-1,
        )  # [T, P, 3]
        if prop == "Young":
            r = np.einsum("tpi,tpj,tpk,tpl,ijkl->tp", a, a, a, a, self.Smat)
            vals = 1.0 / r
        elif prop == "LC":
            r = np.einsum("tpi,tpj,ijkk->tp", a, a, self.Smat)
            vals = 1000.0 * r
        else:
            raise ValueError(f"unsupported property {prop!r}")
        return float(vals.min()), float(vals.max())


class ElasticOrtho(Elastic):
    """Orthorhombic fast path: same API, kept for ELATE parity
    (amof/elastic/elate.py:751)."""

    def __init__(self, arg):
        if isinstance(arg, Elastic):
            self.CVoigt = arg.CVoigt
            self.SVoigt = arg.SVoigt
            self.Smat = arg.Smat
        else:
            Elastic.__init__(self, arg)
