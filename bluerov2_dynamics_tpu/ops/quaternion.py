"""Quaternion kernels (scalar-first Hamilton convention, natively batched).

Semantics match ``/root/reference/fossen/BlueROV2_wrench.py:27-138``:
q = [qw, qx, qy, qz], Hamilton product, q_dot = 0.5 * q (x) [0, omega],
Z-Y-X Euler <-> quaternion conversion helpers.

All functions accept arbitrary leading batch dimensions; quaternions are
``(..., 4)`` arrays, vectors ``(..., 3)``.
"""

from __future__ import annotations

import jax.numpy as jnp

_NORM_EPS = 1e-12


def quat_normalize(q, eps=_NORM_EPS):
    """Normalize quaternions; near-zero quaternions fall back to identity.

    Reference: ``fossen/BlueROV2_wrench.py:27-36``.
    """
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    identity = jnp.zeros_like(q).at[..., 0].set(1.0)
    safe_n = jnp.where(n < eps, 1.0, n)
    return jnp.where(n < eps, identity, q / safe_n)


def quat_to_rotation_matrix(q, normalize=True):
    """Quaternion -> DCM R_{b->n}, shape ``(..., 3, 3)``.

    Reference: ``fossen/BlueROV2_wrench.py:39-53``.
    """
    if normalize:
        q = quat_normalize(q)
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1.0 - 2.0 * (qy * qy + qz * qz), 2.0 * (qx * qy - qz * qw), 2.0 * (qx * qz + qy * qw)],
        axis=-1,
    )
    row1 = jnp.stack(
        [2.0 * (qx * qy + qz * qw), 1.0 - 2.0 * (qx * qx + qz * qz), 2.0 * (qy * qz - qx * qw)],
        axis=-1,
    )
    row2 = jnp.stack(
        [2.0 * (qx * qz - qy * qw), 2.0 * (qy * qz + qx * qw), 1.0 - 2.0 * (qx * qx + qy * qy)],
        axis=-1,
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def quat_rotate(q, v):
    """Rotate body vectors into NED: R_{b->n}(q) @ v, fused elementwise.

    Assumes ``q`` is already (approximately) unit norm.
    """
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
    nx = (1.0 - 2.0 * (qy * qy + qz * qz)) * vx + 2.0 * (qx * qy - qz * qw) * vy + 2.0 * (qx * qz + qy * qw) * vz
    ny = 2.0 * (qx * qy + qz * qw) * vx + (1.0 - 2.0 * (qx * qx + qz * qz)) * vy + 2.0 * (qy * qz - qx * qw) * vz
    nz = 2.0 * (qx * qz - qy * qw) * vx + 2.0 * (qy * qz + qx * qw) * vy + (1.0 - 2.0 * (qx * qx + qy * qy)) * vz
    return jnp.stack([nx, ny, nz], axis=-1)


def quat_rotate_inv(q, v):
    """Rotate NED vectors into body: R_{b->n}(q)^T @ v, fused elementwise."""
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
    bx = (1.0 - 2.0 * (qy * qy + qz * qz)) * vx + 2.0 * (qx * qy + qz * qw) * vy + 2.0 * (qx * qz - qy * qw) * vz
    by = 2.0 * (qx * qy - qz * qw) * vx + (1.0 - 2.0 * (qx * qx + qz * qz)) * vy + 2.0 * (qy * qz + qx * qw) * vz
    bz = 2.0 * (qx * qz + qy * qw) * vx + 2.0 * (qy * qz - qx * qw) * vy + (1.0 - 2.0 * (qx * qx + qy * qy)) * vz
    return jnp.stack([bx, by, bz], axis=-1)


def quat_multiply(q1, q2):
    """Hamilton product q1 (x) q2 for scalar-first quaternions.

    Reference: ``fossen/BlueROV2_wrench.py:56-68``.
    """
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conjugate(q):
    """Conjugate (= inverse for unit quaternions), scalar-first."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], q.dtype)


def quat_exp(rotvec):
    """Exponential map: rotation vector ``(…, 3)`` → unit quaternion
    ``(…, 4)`` scalar-first (TPU-native extension, no reference
    counterpart; the retraction of the manifold EKF in
    ``models/estimation.py``).

    Taylor-guarded at zero — ``cos(a/2) ≈ 1 − a²/8`` and
    ``sin(a/2)/a ≈ 1/2 − a²/48`` — so it is exactly differentiable at
    ``rotvec = 0``, where the error-state Jacobians are evaluated
    (a naive ``norm`` there has a NaN gradient).
    """
    rotvec = jnp.asarray(rotvec)
    a2 = jnp.sum(rotvec * rotvec, axis=-1, keepdims=True)
    small = a2 < 1e-12
    ang = jnp.sqrt(jnp.where(small, 1.0, a2))
    s = jnp.where(small, 0.5 - a2 / 48.0, jnp.sin(0.5 * ang) / ang)
    w = jnp.where(small[..., 0], 1.0 - a2[..., 0] / 8.0,
                  jnp.cos(0.5 * ang[..., 0]))
    return jnp.concatenate([w[..., None], rotvec * s], axis=-1)


def quat_log(q):
    """Logarithmic map: unit quaternion → rotation vector ``(…, 3)``
    (inverse of :func:`quat_exp`; shortest arc — the sign of ``qw`` is
    normalized first so the result is in the ±π ball).

    First-order Taylor guard at the identity (``k ≈ 2/qw``), matching
    :func:`quat_exp`'s differentiability at zero.
    """
    q = jnp.asarray(q)
    q = q * jnp.sign(jnp.where(q[..., :1] == 0.0, 1.0, q[..., :1]))
    qw, qv = q[..., 0], q[..., 1:]
    n2 = jnp.sum(qv * qv, axis=-1, keepdims=True)
    small = n2 < 1e-14
    nv = jnp.sqrt(jnp.where(small, 1.0, n2))
    ang = 2.0 * jnp.arctan2(nv[..., 0], qw)
    k = jnp.where(small[..., 0], 2.0 / jnp.maximum(qw, 1e-6),
                  ang / nv[..., 0])
    return qv * k[..., None]


def quat_derivative(q, omega_body):
    """q_dot = 0.5 * q (x) [0, p, q, r], fused elementwise.

    Reference: ``fossen/BlueROV2_wrench.py:71-79``.
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    p, qr, r = omega_body[..., 0], omega_body[..., 1], omega_body[..., 2]
    return 0.5 * jnp.stack(
        [
            -x * p - y * qr - z * r,
            w * p + y * r - z * qr,
            w * qr - x * r + z * p,
            w * r + x * qr - y * p,
        ],
        axis=-1,
    )


def euler_to_quat(phi, theta, psi):
    """Z-Y-X Euler angles -> unit quaternion ``(..., 4)``.

    Reference: ``fossen/BlueROV2_wrench.py:86-106``.
    """
    c1, s1 = jnp.cos(phi * 0.5), jnp.sin(phi * 0.5)
    c2, s2 = jnp.cos(theta * 0.5), jnp.sin(theta * 0.5)
    c3, s3 = jnp.cos(psi * 0.5), jnp.sin(psi * 0.5)
    q = jnp.stack(
        [
            c3 * c2 * c1 + s3 * s2 * s1,
            c3 * c2 * s1 - s3 * s2 * c1,
            c3 * s2 * c1 + s3 * c2 * s1,
            s3 * c2 * c1 - c3 * s2 * s1,
        ],
        axis=-1,
    )
    return quat_normalize(q)


def quat_to_euler(q):
    """Quaternion -> (phi, theta, psi) Z-Y-X Euler angles.

    Reference: ``fossen/BlueROV2_wrench.py:109-132``.
    """
    q = quat_normalize(q)
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    phi = jnp.arctan2(2.0 * (qw * qx + qy * qz), 1.0 - 2.0 * (qx * qx + qy * qy))
    sinp = jnp.clip(2.0 * (qw * qy - qz * qx), -1.0, 1.0)
    theta = jnp.arcsin(sinp)
    psi = jnp.arctan2(2.0 * (qw * qz + qx * qy), 1.0 - 2.0 * (qy * qy + qz * qz))
    return phi, theta, psi


def quat_to_yaw(q):
    """Quaternion -> yaw angle. Reference: ``fossen/BlueROV2_wrench.py:134-138``."""
    q = quat_normalize(q)
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.arctan2(2.0 * (qw * qz + qx * qy), 1.0 - 2.0 * (qy * qy + qz * qz))
