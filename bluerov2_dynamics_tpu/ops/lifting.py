"""Observable lifts for Koopman system identification.

The Gaussian-RBF dictionary lift of the reference
(``Koopman/koopmanEDMDc.py:37-48, 221-236``):
``phi(x) = [x, exp(-gamma ||x - c_1||^2), ..., exp(-gamma ||x - c_k||^2)]``
computed as one GEMM over the batch via the Gram expansion
``||x||^2 + ||c||^2 - 2 x @ C^T`` — already the MXU-friendly form; kept
natively batched over arbitrary leading dimensions.

TPU numerics note: the cross-term GEMM runs at HIGHEST matmul precision
(f32 via multi-pass bf16).  At the TPU default (single-pass bf16) the
Gram expansion cancels catastrophically for states far from the origin —
a tank recording with psi wound to ~60 rad gives ``||x||^2 ~ 3.8e3`` and
bf16 products err by ~10, so the "squared distance" comes out at -26 and
``exp(-gamma * sqdist)`` overflows to 1e33 and the downstream ridge solve
to NaN.  The distance is additionally clamped at zero (exact arithmetic
guarantees sqdist >= 0; floating point does not).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def rbf_features(X, centers, gamma, weights=None):
    """Gaussian RBF feature matrix ``exp(-gamma ||w*(x - c)||^2)``.

    ``X``: ``(..., n)``; ``centers``: ``(k, n)``; returns ``(..., k)``.
    ``weights`` (optional, (n,)) rescales coordinates before the distance —
    a 0/1 mask makes the dictionary invariant to the masked coordinates
    (e.g. position-invariance: the vehicle dynamics do not depend on x,y,z,
    so position-bearing RBFs waste dictionary capacity and generalize
    poorly on drifting trajectories).
    """
    if weights is not None:
        X = X * weights
        centers = centers * weights
    x2 = jnp.sum(X * X, axis=-1, keepdims=True)          # (..., 1)
    c2 = jnp.sum(centers * centers, axis=-1)             # (k,)
    cross = jnp.matmul(X, centers.T,
                       precision=lax.Precision.HIGHEST)  # (..., k) — MXU
    sqdist = jnp.maximum(x2 + c2 - 2.0 * cross, 0.0)
    return jnp.exp(-gamma * sqdist)


def rbf_lift(X, centers, gamma, weights=None):
    """Full lift ``phi(x) = [x, rbf(x)]`` of dimension ``d = n + k``."""
    return jnp.concatenate(
        [X, rbf_features(X, centers, gamma, weights)], axis=-1
    )
