"""Spline-softened gravity kernels (Springel 2005 eqs; [G2: forcetree.c
force_treeevaluate() softening branch, potential.c]).

GADGET softens point masses with the same W4 spline used for SPH, with
force-softening length h = 2.8 * epsilon (epsilon = Plummer-equivalent
softening from the parameter file). For r >= h the force is exactly
Newtonian. ``grav_fac(r, h)`` returns g(r) such that

    acc_i = -G * m_j * g(r) * (x_i - x_j)

i.e. g(r) -> 1/r^3 for r >= h. ``grav_pot`` returns phi/ (G m): -1/r
outside the kernel.

Branch-free jnp; broadcasts over [N, K] interaction blocks.
"""

from __future__ import annotations

import jax.numpy as jnp

SOFTFAC = 2.8  # h = 2.8 epsilon [G2: gravtree.c :: set_softenings()]


def grav_fac(r, h_soft, rinv=None):
    """Softened 1/r^3 force factor. `h_soft` is the FORCE softening (2.8 eps).

    Inner branch   (u<1/2): h^-3 (32/3 + u^2 (32 u - 38.4))
    Outer branch (1/2<=u<1): h^-3 (64/3 - 48 u + 38.4 u^2 - 32/3 u^3 - 1/(15 u^3))
    [G2: forcetree.c :: force_treeevaluate(), identical constants]
    """
    r = jnp.asarray(r)
    safe_r = jnp.where(r > 0, r, 1.0)
    rinv = 1.0 / safe_r if rinv is None else rinv
    hinv = jnp.where(h_soft > 0, 1.0 / jnp.maximum(h_soft, 1e-37), 0.0)
    u = r * hinv
    u = jnp.where(r > 0, u, 0.0)
    h3inv = hinv * hinv * hinv
    uinv = jnp.where(u > 0, 1.0 / jnp.maximum(u, 1e-37), 0.0)
    uinv3 = uinv * uinv * uinv
    inner = h3inv * (10.666666666667 + u * u * (32.0 * u - 38.4))
    outer = h3inv * (
        21.333333333333 - 48.0 * u + 38.4 * u * u
        - 10.666666666667 * (u * u * u) - 0.066666666667 * uinv3
    )
    newton = rinv * rinv * rinv
    fac = jnp.where(u < 0.5, inner, jnp.where(u < 1.0, outer, newton))
    return jnp.where(r > 0, fac, 0.0)


def grav_pot(r, h_soft, rinv=None):
    """Softened potential factor: phi = G * m * grav_pot(r, h).

    Returns -1/r outside the kernel; finite (-2.8/h) at r=0
    [G2: potential.c / forcetree.c potential branch constants].
    """
    r = jnp.asarray(r)
    safe_r = jnp.where(r > 0, r, 1.0)
    rinv = 1.0 / safe_r if rinv is None else rinv
    hinv = jnp.where(h_soft > 0, 1.0 / jnp.maximum(h_soft, 1e-37), 0.0)
    u = r * hinv
    uinv = jnp.where(u > 0, 1.0 / jnp.maximum(u, 1e-37), 0.0)
    wp_inner = -2.8 + u * u * (5.333333333333 + u * u * (6.4 * u - 9.6))
    wp_outer = (
        -3.2 + 0.066666666667 * uinv
        + u * u * (10.666666666667 + u * (-16.0 + u * (9.6 - 2.133333333333 * u)))
    )
    newton = -rinv
    pot = jnp.where(
        u < 0.5, hinv * wp_inner, jnp.where(u < 1.0, hinv * wp_outer, newton)
    )
    # r == 0 (self-interaction): inner branch at u=0 gives -2.8/h — but the
    # caller masks self terms anyway; keep it finite.
    return jnp.where(r > 0, pot, -2.8 * hinv)
