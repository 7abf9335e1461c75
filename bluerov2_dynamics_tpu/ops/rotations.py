"""Euler-angle rotation and kinematics kernels (natively batched).

Semantics match the reference implementation
(``/root/reference/fossen/BlueROV2.py:23-62``): Z-Y-X Euler convention,
R_{b->n} = Rz(psi) @ Ry(theta) @ Rx(phi), body-rate -> Euler-rate matrix
J2 with a cos(theta) clamp at eps=1e-7 as a gimbal-lock guard.

TPU-first design notes
----------------------
The hot paths never materialise 3x3 matrices per batch element: the
``rotate_b2n`` / ``rotate_n2b`` / ``euler_rates`` kernels expand the
matrix-vector products into fused elementwise expressions over arrays of
shape ``(..., 3)``.  XLA fuses the whole thing into a single VPU kernel
over the batch.  ``rotation_matrix`` / ``euler_kinematics_matrix`` are
provided for API parity, tests and host-side use.
"""

from __future__ import annotations

import jax.numpy as jnp

_GIMBAL_EPS = 1e-7


def ssa(angle):
    """Smallest signed angle: wrap to [-pi, pi).

    Matches ``/root/reference/fossen/bluerov_torch.py:8-18``.
    """
    two_pi = 2.0 * jnp.pi
    return angle - two_pi * jnp.floor((angle + jnp.pi) / two_pi)


def _trig(phi, theta, psi):
    return (
        jnp.cos(phi), jnp.sin(phi),
        jnp.cos(theta), jnp.sin(theta),
        jnp.cos(psi), jnp.sin(psi),
    )


def rotation_matrix(phi, theta, psi):
    """Z-Y-X Euler rotation matrix R_{b->n}, shape ``(..., 3, 3)``.

    R_{n->b} = R^T.  Reference: ``fossen/BlueROV2.py:23-41``.
    """
    cphi, sphi, cth, sth, cpsi, spsi = _trig(phi, theta, psi)
    row0 = jnp.stack(
        [cpsi * cth, -spsi * cphi + cpsi * sth * sphi, spsi * sphi + cpsi * cphi * sth],
        axis=-1,
    )
    row1 = jnp.stack(
        [spsi * cth, cpsi * cphi + sphi * sth * spsi, -cpsi * sphi + sth * spsi * cphi],
        axis=-1,
    )
    row2 = jnp.stack([-sth, cth * sphi, cth * cphi], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def rotate_b2n(phi, theta, psi, v):
    """Apply R_{b->n} to body vectors ``v`` of shape ``(..., 3)``.

    Fused elementwise form of ``rotation_matrix(...) @ v`` — no batched
    3x3 matmuls, one VPU kernel over the batch.
    """
    cphi, sphi, cth, sth, cpsi, spsi = _trig(phi, theta, psi)
    vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
    nx = cpsi * cth * vx + (-spsi * cphi + cpsi * sth * sphi) * vy + (spsi * sphi + cpsi * cphi * sth) * vz
    ny = spsi * cth * vx + (cpsi * cphi + sphi * sth * spsi) * vy + (-cpsi * sphi + sth * spsi * cphi) * vz
    nz = -sth * vx + cth * sphi * vy + cth * cphi * vz
    return jnp.stack([nx, ny, nz], axis=-1)


def rotate_n2b(phi, theta, psi, v):
    """Apply R_{n->b} = R_{b->n}^T to NED vectors ``v`` of shape ``(..., 3)``."""
    cphi, sphi, cth, sth, cpsi, spsi = _trig(phi, theta, psi)
    vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
    bx = cpsi * cth * vx + spsi * cth * vy - sth * vz
    by = (
        (-spsi * cphi + cpsi * sth * sphi) * vx
        + (cpsi * cphi + sphi * sth * spsi) * vy
        + cth * sphi * vz
    )
    bz = (
        (spsi * sphi + cpsi * cphi * sth) * vx
        + (-cpsi * sphi + sth * spsi * cphi) * vy
        + cth * cphi * vz
    )
    return jnp.stack([bx, by, bz], axis=-1)


def _clamped_cos_theta(theta, eps=_GIMBAL_EPS):
    """cos(theta) clamped away from zero (gimbal guard).

    Mirrors the reference guard at ``fossen/BlueROV2.py:53-54``; we use a
    branch-free ``where`` and treat sign(0) as +1 so the result is always
    finite (the reference would divide by zero exactly at |theta|=pi/2).
    """
    cth = jnp.cos(theta)
    sign = jnp.where(cth < 0.0, -1.0, 1.0)
    return jnp.where(jnp.abs(cth) < eps, eps * sign, cth)


def euler_kinematics_matrix(phi, theta, eps=_GIMBAL_EPS):
    """Body-rates [p,q,r] -> Euler-angle rates matrix J2, shape ``(...,3,3)``.

    Reference: ``fossen/BlueROV2.py:43-62``.
    """
    sphi = jnp.sin(phi)
    cphi = jnp.cos(phi)
    sth = jnp.sin(theta)
    cth = _clamped_cos_theta(theta, eps)
    tth = sth / cth
    one = jnp.ones_like(sphi * sth)
    zero = jnp.zeros_like(one)
    row0 = jnp.stack([one, sphi * tth, cphi * tth], axis=-1)
    row1 = jnp.stack([zero, cphi * one, -sphi * one], axis=-1)
    row2 = jnp.stack([zero, sphi / cth, cphi / cth], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def euler_rates(phi, theta, omega, eps=_GIMBAL_EPS):
    """Fused J2(phi, theta) @ omega for body rates ``omega`` of shape ``(..., 3)``."""
    sphi = jnp.sin(phi)
    cphi = jnp.cos(phi)
    sth = jnp.sin(theta)
    cth = _clamped_cos_theta(theta, eps)
    tth = sth / cth
    p, q, r = omega[..., 0], omega[..., 1], omega[..., 2]
    phidot = p + sphi * tth * q + cphi * tth * r
    thetadot = cphi * q - sphi * r
    psidot = (sphi * q + cphi * r) / cth
    return jnp.stack([phidot, thetadot, psidot], axis=-1)
