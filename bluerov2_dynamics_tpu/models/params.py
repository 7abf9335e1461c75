"""Parameter pytrees for the BlueROV2 model families.

Two independent coefficient tables exist in the reference and both are kept
here **as data, not code**:

* :func:`fossen_params` — the von Benzon et al. Table A1 "heavy config" set
  used by the full 6-DOF models (``/root/reference/fossen/BlueROV2.py:79-140``).
* :func:`reduced_params` — the alternative set used only by the reduced
  9-state torch RHS (``/root/reference/fossen/parameters.py:1-33``).

All containers are ``NamedTuple`` pytrees so they pass through ``jit`` /
``vmap`` / ``shard_map`` transparently.  Derived quantities that the
reference recomputes per call (mass-matrix inverse, positive damping
coefficient vectors, Coriolis gyroscopic combinations) are precomputed once
at construction — the mass matrix is diagonal, so *no 6x6 linear algebra
appears anywhere in the step*: the whole RHS is fused elementwise work.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class FossenParams(NamedTuple):
    """Coefficients for the full 6-DOF hydrodynamic model.

    Velocity state order is ``nu = [u, v, w, p, q, r]``.
    """

    m: jnp.ndarray            # vehicle mass [kg]
    W: jnp.ndarray            # weight m*g [N]
    B: jnp.ndarray            # buoyancy rho*g*V [N]
    cb: jnp.ndarray           # (3,) centre of buoyancy [xb, yb, zb]
    inertia: jnp.ndarray      # (3,) [Ix, Iy, Iz]
    added: jnp.ndarray        # (6,) added-mass derivatives [Xud..Nrd] (negative)
    d_lin: jnp.ndarray        # (6,) positive linear damping (-Xu, -Yv, ...)
    d_quad: jnp.ndarray       # (6,) positive quadratic damping (-Xu|u|, ...)
    mdiag: jnp.ndarray        # (6,) diagonal of M = MRB + MA
    minv: jnp.ndarray         # (6,) inverse of the diagonal mass matrix
    # Precomputed gyroscopic combinations for C(nu) @ nu (see fossen.py):
    gyro: jnp.ndarray         # (3,) [Iz-Iy+Mqd-Nrd, Ix-Iz+Nrd-Kpd, Iy-Ix+Kpd-Mqd]
    current: jnp.ndarray      # (3,) constant ocean current in NED [m/s]


class ThrusterConfig(NamedTuple):
    """Thruster geometry + static-curve data for the 8-thruster heavy frame."""

    positions: jnp.ndarray    # (8, 3) lever arms r_i in body frame
    directions: jnp.ndarray   # (8, 3) unit thrust directions d_i in body frame
    wrench_map: jnp.ndarray   # (8, 6) rows [d_i ; r_i x d_i]; tau = F @ wrench_map
    curve: jnp.ndarray        # (5,) odd-power coeffs [c1, c3, c5, c7, c9]


class LagParams(NamedTuple):
    """ZOH-discretised third-order thruster lag filter for a fixed dt.

    Continuous system (``fossen/BlueROV2.py:464-481``, transfer function
    derived in ``fossen/thrust_dynamics.m``)::

        K(s) = (6136 s + 108700) / (s^3 + 89 s^2 + 9258 s + 108700)

    discretised once per ``dt`` via the matrix exponential of the augmented
    block [[A, B], [0, 0]] — replacing the reference's lazy
    ``scipy.signal.cont2discrete`` cache (``fossen/BlueROV2.py:489-501``).
    """

    Ad: jnp.ndarray           # (3, 3)
    Bd: jnp.ndarray           # (3,)
    c: jnp.ndarray            # (3,) output row (D term is zero)


class ReducedParams(NamedTuple):
    """Alternative coefficient set for the reduced 9-state RHS.

    Values from ``fossen/parameters.py:1-33`` (m=11.4 kg set).  Only the
    surge/sway/heave/yaw channels are used, mirroring the torch model.
    """

    m: jnp.ndarray
    g: jnp.ndarray
    F_buoy: jnp.ndarray
    X_ud: jnp.ndarray
    Y_vd: jnp.ndarray
    Z_wd: jnp.ndarray
    N_rd: jnp.ndarray
    I_zz: jnp.ndarray
    X_u: jnp.ndarray
    Y_v: jnp.ndarray
    Z_w: jnp.ndarray
    N_r: jnp.ndarray
    X_uc: jnp.ndarray
    Y_vc: jnp.ndarray
    Z_wc: jnp.ndarray
    N_rc: jnp.ndarray


# ---------------------------------------------------------------------------
# Constructors
# ---------------------------------------------------------------------------

def fossen_params(
    rho: float = 1000.0,
    g: float = 9.82,
    m: float = 13.5,
    volume: float = 0.0134,
    cb=(0.0, 0.0, -0.01),
    inertia=(0.26, 0.23, 0.37),
    added=(-6.36, -7.12, -18.68, -0.189, -0.135, -0.222),
    damping_lin=(-13.7, -0.0, -33.0, -0.0, -0.8, -0.0),
    damping_quad=(-141.0, -217.0, -190.0, -1.19, -0.47, -1.5),
    current=(0.0, 0.0, 0.0),
    dtype=jnp.float32,
) -> FossenParams:
    """Build :class:`FossenParams` (defaults: von Benzon Table A1 heavy config).

    Signs follow the reference convention: added-mass and damping
    derivatives are stored negative and negated where used
    (``fossen/BlueROV2.py:110-140``).
    """
    inertia = np.asarray(inertia, np.float64)
    added = np.asarray(added, np.float64)
    d_lin = -np.asarray(damping_lin, np.float64)
    d_quad = -np.asarray(damping_quad, np.float64)
    # Diagonal total mass matrix: MRB + MA with MA = -diag(added).
    m_diag = np.array(
        [m - added[0], m - added[1], m - added[2],
         inertia[0] - added[3], inertia[1] - added[4], inertia[2] - added[5]],
        np.float64,
    )
    Ix, Iy, Iz = inertia
    Kpd, Mqd, Nrd = added[3], added[4], added[5]
    gyro = np.array(
        [Iz - Iy + Mqd - Nrd, Ix - Iz + Nrd - Kpd, Iy - Ix + Kpd - Mqd],
        np.float64,
    )
    cast = lambda a: jnp.asarray(a, dtype)
    return FossenParams(
        m=cast(m),
        W=cast(m * g),
        B=cast(rho * g * volume),
        cb=cast(cb),
        inertia=cast(inertia),
        added=cast(added),
        d_lin=cast(d_lin),
        d_quad=cast(d_quad),
        mdiag=cast(m_diag),
        minv=cast(1.0 / m_diag),
        gyro=cast(gyro),
        current=cast(current),
    )


# T200 static thrust curve, odd powers [V, V^3, V^5, V^7, V^9]
# (``fossen/BlueROV2.py:234-263``, paper eq. 18).
T200_CURVE = (8.9, 176.0, -404.1, 389.9, -140.3)

# Thruster frame geometry (``fossen/BlueROV2.py:172-232``): azimuth angles of
# the Rz rotations applied to the base lever arm / direction vectors.
_R1234 = (0.156, 0.111, 0.085)
_R5678 = (0.12, 0.218, 0.0)
_POS_ANGLES = (0.0, 5.05, 1.91, math.pi, 0.0, 4.15, 1.01, math.pi)
_DIR_ANGLES = (0.0, math.pi / 2.0, 3.0 * math.pi / 2.0, math.pi)


def _rz(alpha: float) -> np.ndarray:
    c, s = math.cos(alpha), math.sin(alpha)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]], np.float64)


def thruster_config(dtype=jnp.float32) -> ThrusterConfig:
    """Heavy-configuration thruster geometry and wrench map.

    T1-T4: vectored horizontal thrusters, base lever arm ``_R1234`` rotated
    by ``_POS_ANGLES[:4]``, base direction [1/sqrt2, -1/sqrt2, 0] rotated by
    ``_DIR_ANGLES`` (the 3pi/2 entry fixes a wrong angle in the paper, per
    ``fossen/BlueROV2.py:194``).  T5-T8: vertical thrusters pointing -z.
    """
    base_dir = np.array([1.0 / math.sqrt(2.0), -1.0 / math.sqrt(2.0), 0.0])
    positions = np.stack(
        [_rz(a) @ np.asarray(_R1234) for a in _POS_ANGLES[:4]]
        + [_rz(a) @ np.asarray(_R5678) for a in _POS_ANGLES[4:]]
    )
    directions = np.stack(
        [_rz(a) @ base_dir for a in _DIR_ANGLES]
        + [np.array([0.0, 0.0, -1.0])] * 4
    )
    moments = np.cross(positions, directions)
    wrench_map = np.concatenate([directions, moments], axis=1)  # (8, 6)
    return ThrusterConfig(
        positions=jnp.asarray(positions, dtype),
        directions=jnp.asarray(directions, dtype),
        wrench_map=jnp.asarray(wrench_map, dtype),
        curve=jnp.asarray(T200_CURVE, dtype),
    )


# Continuous-time lag filter matrices (``fossen/BlueROV2.py:476-481``).
LAG_AC = np.array(
    [[-89.0, -72.33, -26.54], [128.0, 0.0, 0.0], [0.0, 32.0, 0.0]], np.float64
)
LAG_BC = np.array([8.0, 0.0, 0.0], np.float64)
LAG_C = np.array([0.0, 5.992, 3.317], np.float64)


def lag_params(dt: float, dtype=jnp.float32) -> LagParams:
    """ZOH-discretise the lag filter for step size ``dt``.

    Uses the standard augmented-matrix identity
    ``expm([[A, B], [0, 0]] * dt) = [[Ad, Bd], [0, I]]`` — exact ZOH,
    equivalent to ``scipy.signal.cont2discrete(..., method='zoh')`` used by
    the reference (``fossen/BlueROV2.py:489-496``), computed host-side in
    float64.
    """
    import scipy.linalg

    aug = np.zeros((4, 4), np.float64)
    aug[:3, :3] = LAG_AC
    aug[:3, 3] = LAG_BC
    E = scipy.linalg.expm(aug * float(dt))
    return LagParams(
        Ad=jnp.asarray(E[:3, :3], dtype),
        Bd=jnp.asarray(E[:3, 3], dtype),
        c=jnp.asarray(LAG_C, dtype),
    )


def reduced_params(dtype=jnp.float32) -> ReducedParams:
    """The m=11.4 kg coefficient set (``fossen/parameters.py:1-33``)."""
    g = 9.82
    cast = lambda v: jnp.asarray(v, dtype)
    return ReducedParams(
        m=cast(11.4),
        g=cast(g),
        F_buoy=cast(1026.0 * 0.0115 * g),
        X_ud=cast(-2.6),
        Y_vd=cast(-18.5),
        Z_wd=cast(-13.3),
        N_rd=cast(-0.28),
        I_zz=cast(0.245),
        X_u=cast(-0.09),
        Y_v=cast(-0.26),
        Z_w=cast(-0.19),
        N_r=cast(-4.64),
        X_uc=cast(-34.96),
        Y_vc=cast(-103.25),
        Z_wc=cast(-74.23),
        N_rc=cast(-0.43),
    )
