"""SPH kernel + softened-gravity kernel unit tests (SURVEY.md §4 rebuild
test plan: kernel-vs-reference-formula)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gadget_leicester_tpu.ops.sph_kernels import (kernel_dw_dr, kernel_w,
                                                  kernel_w_and_dwdh)
from gadget_leicester_tpu.ops.softening import grav_fac, grav_pot


def test_kernel_normalisation():
    """int W dV = 1 over the support sphere."""
    h = 1.7
    r = np.linspace(0, h, 20001)
    w = np.asarray(kernel_w(jnp.asarray(r), h))
    integral = np.trapezoid(4 * np.pi * r**2 * w, r)
    assert abs(integral - 1.0) < 1e-5


def test_kernel_compact_support_and_center():
    h = 2.0
    assert float(kernel_w(jnp.asarray(2.0001), h)) == 0.0
    assert float(kernel_w(jnp.asarray(0.0), h)) == pytest.approx(
        8.0 / np.pi / h**3, rel=1e-6
    )


def test_kernel_derivative_matches_fd():
    h = 1.3
    r = np.linspace(0.01, h * 0.999, 500)
    eps = 1e-3
    fd = (np.asarray(kernel_w(jnp.asarray(r + eps), h))
          - np.asarray(kernel_w(jnp.asarray(r - eps), h))) / (2 * eps)
    an = np.asarray(kernel_dw_dr(jnp.asarray(r), h))
    np.testing.assert_allclose(an, fd, rtol=2e-3, atol=1e-4)


def test_kernel_dwdh_matches_fd():
    h = 1.1
    r = np.linspace(0.0, h * 0.95, 300)
    eps = 1e-3
    fd = (np.asarray(kernel_w(jnp.asarray(r), h + eps))
          - np.asarray(kernel_w(jnp.asarray(r), h - eps))) / (2 * eps)
    _, an = kernel_w_and_dwdh(jnp.asarray(r), h)
    np.testing.assert_allclose(np.asarray(an), fd, rtol=2e-3, atol=1e-4)


def test_softened_force_newtonian_outside():
    h = 0.14  # force softening
    r = np.asarray([0.14, 0.2, 1.0, 5.0])
    fac = np.asarray(grav_fac(jnp.asarray(r), h))
    np.testing.assert_allclose(fac, 1.0 / r**3, rtol=1e-5)


def test_softened_potential_newtonian_outside():
    h = 0.14
    r = np.asarray([0.14, 0.2, 1.0, 5.0])
    pot = np.asarray(grav_pot(jnp.asarray(r), h))
    np.testing.assert_allclose(pot, -1.0 / r, rtol=1e-5)


def test_softened_force_is_gradient_of_potential():
    """-d(phi)/dr = F = fac * r, across the softened region."""
    h = 1.0
    r = np.linspace(0.02, 1.4, 400)
    eps = 1e-3
    dphi = (np.asarray(grav_pot(jnp.asarray(r + eps), h))
            - np.asarray(grav_pot(jnp.asarray(r - eps), h))) / (2 * eps)
    force = np.asarray(grav_fac(jnp.asarray(r), h)) * r
    np.testing.assert_allclose(force, dphi, rtol=5e-3, atol=1e-3)


def test_softened_force_finite_at_center():
    h = 1.0
    fac0 = float(grav_fac(jnp.asarray(1e-8), h))
    # spline softening: F = fac * r -> 0 as r -> 0, fac -> 32/3/h^3
    assert fac0 == pytest.approx(32.0 / 3.0, rel=1e-3)
