"""Ewald summation for exactly-periodic gravity — the correctness oracle
for TreePM [G2: gravtree_forcetest.c computes periodic direct forces with
the Ewald lattice sum; forcetree.c :: ewald_init()/ewald_force() tabulates
the correction].

Host-side numpy implementation (used by tests and the forcetest mode, not
in the hot path): the periodic acceleration of particle i is

    acc_i = sum_j m_j f(x_i - x_j),   f(r) -> -r/|r|^3 as r -> 0,

with f split into a real-space sum over image boxes (erfc-screened) and a
k-space sum (Gaussian-screened), following Hernquist, Bungartz & Springel
(1991) — the same formulation the reference tabulates on its 64^3 grid.
"""

from __future__ import annotations

import itertools

import numpy as np
from scipy.special import erfc  # available via scipy (baked into the image)


def ewald_pair_force(r: np.ndarray, box: float, alpha: float | None = None,
                     nmax: int = 4, kmax: int = 4) -> np.ndarray:
    """f(r) [M,3] such that acc_i = sum_j m_j f(x_i - x_j).

    alpha defaults to 2/box [G2: forcetree.c ewald_init()].
    """
    r = np.atleast_2d(np.asarray(r, np.float64))
    if alpha is None:
        alpha = 2.0 / box
    f = np.zeros_like(r)
    # real-space lattice sum
    for n in itertools.product(range(-nmax, nmax + 1), repeat=3):
        u = r + np.asarray(n, np.float64) * box
        d = np.linalg.norm(u, axis=1)
        ok = d > 0
        du = np.where(ok, d, 1.0)
        scr = erfc(alpha * du) + 2.0 * alpha * du / np.sqrt(np.pi) * np.exp(
            -(alpha * du) ** 2)
        f -= np.where(ok[:, None], u / du[:, None] ** 3 * scr[:, None], 0.0)
    # k-space sum
    kf = 2.0 * np.pi / box
    for m in itertools.product(range(-kmax, kmax + 1), repeat=3):
        if m == (0, 0, 0):
            continue
        k = np.asarray(m, np.float64) * kf
        k2 = k @ k
        coef = 4.0 * np.pi / (box**3) * np.exp(-k2 / (4.0 * alpha**2)) / k2
        f -= coef * np.sin(r @ k)[:, None] * k[None, :]
    return f


def ewald_pair_potential(r: np.ndarray, box: float, alpha: float | None = None,
                         nmax: int = 4, kmax: int = 4) -> np.ndarray:
    """phi(r) [M] with phi -> -1/|r| as r -> 0 (plus the constant lattice
    background terms, matching [G2: ewald_psi()] up to the same constant)."""
    r = np.atleast_2d(np.asarray(r, np.float64))
    if alpha is None:
        alpha = 2.0 / box
    phi = np.zeros(r.shape[0])
    for n in itertools.product(range(-nmax, nmax + 1), repeat=3):
        u = r + np.asarray(n, np.float64) * box
        d = np.linalg.norm(u, axis=1)
        ok = d > 0
        du = np.where(ok, d, 1.0)
        phi -= np.where(ok, erfc(alpha * du) / du, 0.0)
    kf = 2.0 * np.pi / box
    for m in itertools.product(range(-kmax, kmax + 1), repeat=3):
        if m == (0, 0, 0):
            continue
        k = np.asarray(m, np.float64) * kf
        k2 = k @ k
        phi -= 4.0 * np.pi / (box**3) * np.exp(-k2 / (4.0 * alpha**2)) / k2 * \
            np.cos(r @ k)
    phi += np.pi / (alpha**2 * box**3)  # charge-neutralising background
    return phi


def direct_periodic_forces(pos: np.ndarray, mass: np.ndarray, box: float,
                           nmax: int = 4, kmax: int = 4) -> np.ndarray:
    """O(N^2) exactly-periodic accelerations (no G) — the forcetest oracle
    [G2: gravity_forcetest()]. Point masses, no softening."""
    n = len(pos)
    acc = np.zeros((n, 3))
    for i in range(n):
        r = pos[i] - pos  # [N,3]
        f = ewald_pair_force(r, box, nmax=nmax, kmax=kmax)
        f[i] = 0.0  # self images cancel by symmetry; avoid 0/0
        acc[i] = (mass[:, None] * f).sum(axis=0)
    return acc
