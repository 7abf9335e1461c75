"""On-device k-means (k-means++ init + Lloyd iterations).

Replaces the reference's sklearn ``KMeans(n_clusters, n_init='auto',
random_state=0)`` call (``Koopman/koopmanEDMDc.py:85-86``) with a jitted
implementation: distance evaluation is one GEMM per round
(``|x|^2 - 2 x @ C^T + |c|^2``), the center update is a one-hot GEMM —
both MXU work.  Bit-level parity with sklearn is not achievable (different
sampling); downstream parity is validated on fit RMSE instead
(SURVEY.md §7 "k-means determinism").
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _pairwise_sqdist(X, C):
    """Squared Euclidean distances (N, k) via the Gram expansion.

    HIGHEST matmul precision + clamp at zero: at the TPU-default bf16
    matmul precision the expansion cancels catastrophically for states
    far from the origin (see ops/lifting.py for the failure mode).
    """
    x2 = jnp.sum(X * X, axis=1)[:, None]
    c2 = jnp.sum(C * C, axis=1)[None, :]
    cross = jnp.matmul(X, C.T, precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(x2 + c2 - 2.0 * cross, 0.0)


def _kmeanspp_init(key, X, k: int):
    """k-means++ seeding: iteratively sample points w.p. proportional to the
    squared distance from the nearest already-chosen center."""
    N = X.shape[0]
    key, sub = jax.random.split(key)
    first = X[jax.random.randint(sub, (), 0, N)]
    centers0 = jnp.zeros((k, X.shape[1]), X.dtype).at[0].set(first)
    d0 = jnp.sum((X - first) ** 2, axis=1)

    def body(carry, i):
        centers, min_d, key = carry
        key, sub = jax.random.split(key)
        # Sample proportional to min_d (guard the degenerate all-zero case).
        total = jnp.sum(min_d)
        p = jnp.where(total > 0, min_d / total, jnp.ones_like(min_d) / N)
        idx = jax.random.choice(sub, N, p=p)
        c = X[idx]
        centers = centers.at[i].set(c)
        min_d = jnp.minimum(min_d, jnp.sum((X - c) ** 2, axis=1))
        return (centers, min_d, key), None

    (centers, _, _), _ = jax.lax.scan(
        body, (centers0, d0, key), jnp.arange(1, k)
    )
    return centers


@partial(jax.jit, static_argnums=(2, 3))
def kmeans(key, X, k: int, iters: int = 25):
    """Cluster ``X`` (N, n) into ``k`` centers; returns ``(centers, assign)``.

    Deterministic given ``key``; ``iters`` Lloyd rounds.  Empty clusters
    keep their previous center.
    """
    centers = _kmeanspp_init(key, X, k)

    def lloyd(centers, _):
        d2 = _pairwise_sqdist(X, centers)
        assign = jnp.argmin(d2, axis=1)
        onehot = jax.nn.one_hot(assign, k, dtype=X.dtype)  # (N, k)
        counts = jnp.sum(onehot, axis=0)                   # (k,)
        # HIGHEST like every GEMM whose operands carry raw state values
        # (repo rule from the round-2 bf16 cancellation bug): this is pure
        # summation (no cancellation), but bf16 still costs ~3 decimal
        # digits on centers whose coordinates sit far from the origin
        # (unwrapped psi ~ tens of rads).  Cost: ONE (N,k)^T @ (N,n) GEMM
        # per Lloyd round, ~2*N*k*n = 0.3 GFLOP for the tank fit shapes —
        # negligible against the (N,k) distance GEMM already at HIGHEST.
        sums = jnp.matmul(onehot.T, X,
                          precision=jax.lax.Precision.HIGHEST)  # (k, n)
        new = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts, 1.0)[:, None], centers)
        return new, None

    centers, _ = jax.lax.scan(lloyd, centers, None, length=iters)
    assign = jnp.argmin(_pairwise_sqdist(X, centers), axis=1)
    return centers, assign
