"""Koopman EDMDc system identification with an RBF dictionary.

TPU-native rebuild of the reference ``KoopmanEDMDc`` class
(``/root/reference/Koopman/koopmanEDMDc.py:54-248``):

* RBF centers from **on-device** k-means (:mod:`..ops.kmeans`) instead of
  sklearn (same seed-determinism contract, validated on downstream RMSE);
* ridge regression ``Z+ = A Z + B U`` solved as one big Gram GEMM
  ``G^T G`` (MXU) followed by a Cholesky solve — the ridge-regularised
  matrix is PD, so ``solve`` is exactly the reference's
  ``pinv(G^T G + lambda I) @ G^T Y`` without forming a pseudo-inverse;
* multi-step evaluation and open-loop simulation as ``lax.scan`` over
  GEMMs (the reference's BLAS loop, ``koopmanEDMDc.py:191-199``, was
  already the right shape — here it also covers the decode and runs jitted).

The model is a ``NamedTuple`` pytree; fitting is a pure function.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from bluerov2_dynamics_tpu.eval.metrics import rmse
from bluerov2_dynamics_tpu.ops.kmeans import kmeans
from bluerov2_dynamics_tpu.ops.lifting import rbf_lift


class KoopmanModel(NamedTuple):
    """Learned lifted-linear model ``z+ = A z + B u`` with readout.

    ``decoder`` is ``None`` for the first-n-coordinates readout the
    reference uses (``koopmanEDMDc.py:238-248``); an optional learned
    linear decoder (the reference's commented-out capability,
    ``koopmanEDMDc.py:105-111``) is supported via :func:`fit_decoder`.
    """

    centers: jnp.ndarray          # (k, n)
    gamma: jnp.ndarray            # scalar RBF width
    A: jnp.ndarray                # (d, d)
    B: jnp.ndarray                # (d, r)
    decoder: Optional[jnp.ndarray] = None  # (n, d) or None
    # (n,) coordinate weights for the RBF distance, or None for the
    # reference's full-state dictionary.  A 0/1 mask yields invariance to
    # the masked coordinates (position_invariant=True in fit(); a TPU-era
    # extension — on the drifting pseudo-recording it beats both the
    # full-state dictionary and the physics model at every horizon).
    rbf_weights: Optional[jnp.ndarray] = None

    @property
    def state_dim(self) -> int:
        return self.centers.shape[1]

    @property
    def lift_dim(self) -> int:
        return self.A.shape[0]


def lift(model: KoopmanModel, X):
    """phi(x) = [x, RBF(x)] — ``(..., n) -> (..., d)``."""
    return rbf_lift(X, model.centers, model.gamma, model.rbf_weights)


def decode(model: KoopmanModel, Z):
    """Readout lifted states back to state space."""
    if model.decoder is not None:
        with jax.default_matmul_precision("highest"):
            return Z @ model.decoder.T
    return Z[..., : model.state_dim]


# ---------------------------------------------------------------------------
# Fitting
# ---------------------------------------------------------------------------

def _solve_normal_eqns(gram, rhs, ridge):
    """Tikhonov-regularized normal-equation solve — the ONE solve shared
    by the batch fit (:func:`_ridge_solve`) and the streaming accumulator
    (:func:`streaming_finalize`), so conditioning/precision fixes land in
    both paths."""
    gram = gram + ridge * jnp.eye(gram.shape[0], dtype=gram.dtype)
    return jax.scipy.linalg.solve(gram, rhs, assume_a="pos")


def _ridge_solve(G, Y, ridge):
    """Solve ``min ||G M - Y||^2 + ridge ||M||^2`` for ``M`` (d+r, d).

    Normal equations with the Gram matrix computed at float32-highest
    matmul precision (6-pass f32 on the MXU) to keep conditioning close to
    the reference's float64 path.
    """
    with jax.default_matmul_precision("highest"):
        gram = G.T @ G
        rhs = G.T @ Y
    return _solve_normal_eqns(gram, rhs, ridge)


def _fit_from_blocks(Z, Zp, Uc, centers, gamma, ridge):
    G = jnp.concatenate([Z, Uc], axis=1)
    M = _ridge_solve(G, Zp, ridge)
    d = Z.shape[1]
    A = M[:d].T
    B = M[d:].T
    return KoopmanModel(centers=centers, gamma=jnp.asarray(gamma, Z.dtype), A=A, B=B)


@partial(jax.jit, static_argnums=(3, 6, 7))
def fit(
    key,
    X,
    U,
    n_rbfs: int = 200,
    gamma: float = 1.0,
    ridge: float = 1e-8,
    kmeans_iters: int = 25,
    position_invariant: bool = False,
) -> KoopmanModel:
    """Fit (A, B) from one trajectory: states ``X`` (N, n), inputs ``U`` (N, r).

    Mirrors ``KoopmanEDMDc.fit`` (``koopmanEDMDc.py:72-103``): k-means
    centers on the state cloud, lift consecutive snapshot pairs, ridge
    normal-equation solve.  Fully on-device and jitted.

    ``position_invariant=True`` (extension, default off) masks the first
    three coordinates (x, y, z) out of the RBF distances — the vehicle
    dynamics are translation-invariant, so position-bearing RBFs waste
    dictionary capacity and generalize poorly on drifting recordings.
    """
    weights = None
    if position_invariant:
        weights = jnp.ones(X.shape[1], X.dtype).at[:3].set(0.0)
        X_cl = X * weights
    else:
        X_cl = X
    centers, _ = kmeans(key, X_cl, n_rbfs, iters=kmeans_iters)
    Z = rbf_lift(X[:-1], centers, gamma, weights)
    Zp = rbf_lift(X[1:], centers, gamma, weights)
    model = _fit_from_blocks(Z, Zp, U[:-1], centers, gamma, ridge)
    return model._replace(rbf_weights=weights)


def fit_multi(
    key,
    X_list: Sequence,
    U_list: Sequence,
    n_rbfs: int = 200,
    gamma: float = 1.0,
    ridge: float = 1e-8,
    kmeans_iters: int = 25,
    position_invariant: bool = False,
) -> KoopmanModel:
    """Fit from multiple independent trajectories without cross-bag
    transitions (``KoopmanEDMDc.fit_multi``, ``koopmanEDMDc.py:113-152``).

    Centers are chosen on the union of all states; snapshot pairs are built
    per-trajectory and stacked.  Trajectory list handling is host-side
    (ragged lengths); the lifts and the solve run on device.
    ``position_invariant`` as in :func:`fit` — particularly apt here, since
    recordings from different sessions drift through different regions.
    """
    if len(X_list) != len(U_list) or not X_list:
        # must survive python -O: the zip below would silently drop the
        # unmatched trajectories and fit on less data than requested
        raise ValueError(
            f"X_list ({len(X_list)}) and U_list ({len(U_list)}) must be "
            "equal-length and non-empty")
    X_all = jnp.concatenate([jnp.asarray(X) for X in X_list if len(X) > 0], axis=0)
    weights = None
    if position_invariant:
        weights = jnp.ones(X_all.shape[1], X_all.dtype).at[:3].set(0.0)
        X_all = X_all * weights
    centers, _ = kmeans(key, X_all, n_rbfs, iters=kmeans_iters)
    gamma_arr = jnp.asarray(gamma, X_all.dtype)
    Z_blocks, Zp_blocks, U_blocks = [], [], []
    for X, U in zip(X_list, U_list):
        X = jnp.asarray(X)
        U = jnp.asarray(U)
        if X.shape[0] < 2:
            continue
        Z_blocks.append(rbf_lift(X[:-1], centers, gamma_arr, weights))
        Zp_blocks.append(rbf_lift(X[1:], centers, gamma_arr, weights))
        U_blocks.append(U[:-1])
    Z = jnp.concatenate(Z_blocks, axis=0)
    Zp = jnp.concatenate(Zp_blocks, axis=0)
    Uc = jnp.concatenate(U_blocks, axis=0)
    model = _fit_from_blocks(Z, Zp, Uc, centers, gamma_arr, ridge)
    return model._replace(rbf_weights=weights)


def fit_decoder(model: KoopmanModel, X, ridge: float = 1e-6) -> KoopmanModel:
    """Learn a linear decoder ``x ~ W z`` (optional capability; the
    reference sketches it at ``koopmanEDMDc.py:105-111, 244-246``).

    ``ridge`` is RELATIVE to the mean Gram diagonal: the lifted features
    are highly correlated (RBF dictionary), so an absolute 1e-8 ridge can
    leave the f32 Cholesky of ``Z^T Z`` non-positive-definite and the
    decoder NaN.
    """
    Z = lift(model, X)
    scale = jnp.mean(jnp.sum(Z * Z, axis=0))
    W = _ridge_solve(Z, X, ridge * scale)  # (d, n)
    return model._replace(decoder=W.T)


# ---------------------------------------------------------------------------
# Streaming / recursive fit (TPU-native extension)
# ---------------------------------------------------------------------------
#
# The reference refits from scratch on every run (``koopmanEDMDc.py:72-103``
# — a batch normal-equation solve).  For deployment the natural form is the
# SUFFICIENT-STATISTICS factorisation of the same solve: the ridge solution
# depends on the data only through ``gram = G^T G`` and ``rhs = G^T Z+``,
# which accumulate over chunks as two GEMMs per chunk — so the model can be
# updated online from a live telemetry stream and re-solved at any time for
# the cost of one (d+r)^2 Cholesky.  An exponential forgetting factor
# ``lam`` turns the accumulator into recursive least squares (each pair's
# weight decays as lam^age), letting the model track slow plant changes
# (biofouling drag, payload swaps, trim shifts) that a batch fit averages
# away.  With ``lam=1`` and the same pairs, ``streaming_finalize`` is
# EXACTLY the batch :func:`fit` solve (tests pin f64 agreement).
#
# TPU shape notes: the per-chunk update is two HIGHEST-precision GEMMs over
# the chunk (MXU work growing with chunk size, constant-size state), and
# ``streaming_scan`` runs the whole chunk sequence as one ``lax.scan`` —
# no per-chunk dispatch.  Centers stay fixed (choose them on a calibration
# segment via k-means, or reuse a prior model's); only (A, B) adapt.


class KoopmanStats(NamedTuple):
    """Sufficient statistics of the EDMDc ridge solve, accumulated online.

    ``prev_z``/``prev_u``/``prev_valid`` carry the last lifted sample across
    chunk boundaries so an arbitrary chunking of a contiguous recording
    yields exactly the batch fit's snapshot pairs (no boundary pair lost).
    ``weight_sum`` is the effective number of pairs (sum of forgetting
    weights) — the adaptation memory is ``~1/(1-lam)`` pairs.
    """

    centers: jnp.ndarray              # (k, n)
    gamma: jnp.ndarray                # scalar
    gram: jnp.ndarray                 # (d+r, d+r) = sum w_i g_i g_i^T
    rhs: jnp.ndarray                  # (d+r, d)   = sum w_i g_i z+_i^T
    weight_sum: jnp.ndarray           # scalar
    prev_z: jnp.ndarray               # (d,) lifted last sample seen
    prev_u: jnp.ndarray               # (r,) input at that sample
    prev_valid: jnp.ndarray           # scalar 0/1
    rbf_weights: Optional[jnp.ndarray] = None  # (n,) or None

    @property
    def state_dim(self) -> int:
        return self.centers.shape[1]

    @property
    def lift_dim(self) -> int:
        return self.rhs.shape[1]

    @property
    def input_dim(self) -> int:
        return self.rhs.shape[0] - self.rhs.shape[1]


def streaming_init(centers, gamma, input_dim: int,
                   rbf_weights=None, dtype=jnp.float32) -> KoopmanStats:
    """Empty accumulator for a fixed dictionary.

    ``centers`` may come from :func:`..ops.kmeans.kmeans` on a calibration
    segment or from an existing :class:`KoopmanModel` (``model.centers``,
    ``model.rbf_weights``).
    """
    centers = jnp.asarray(centers, dtype)
    k, n = centers.shape
    d = n + k
    return KoopmanStats(
        centers=centers,
        gamma=jnp.asarray(gamma, dtype),
        gram=jnp.zeros((d + input_dim, d + input_dim), dtype),
        rhs=jnp.zeros((d + input_dim, d), dtype),
        weight_sum=jnp.zeros((), dtype),
        prev_z=jnp.zeros((d,), dtype),
        prev_u=jnp.zeros((input_dim,), dtype),
        prev_valid=jnp.zeros((), dtype),
        rbf_weights=(None if rbf_weights is None
                     else jnp.asarray(rbf_weights, dtype)),
    )


@jax.jit
def streaming_update(stats: KoopmanStats, X, U,
                     forgetting=1.0) -> KoopmanStats:
    """Absorb a contiguous chunk ``X`` (N, n), ``U`` (N, r) into the stats.

    The chunk contributes its N-1 internal snapshot pairs plus (when a
    previous chunk has been seen) the boundary pair (prev -> X[0]).  With
    ``forgetting < 1`` every pair already absorbed decays by
    ``forgetting^m`` (m = pairs added here) and the new pairs enter with
    weights ``forgetting^age`` (newest pair weight 1) — standard
    exponentially-weighted RLS, evaluated chunk-at-a-time as two GEMMs.
    """
    X = jnp.asarray(X, stats.gram.dtype)
    U = jnp.asarray(U, stats.gram.dtype)
    N = X.shape[0]
    if N == 0:  # empty poll from a live source: nothing to absorb
        return stats
    lam = jnp.asarray(forgetting, stats.gram.dtype)
    Z_all = rbf_lift(X, stats.centers, stats.gamma, stats.rbf_weights)
    # Row 0 = boundary pair (prev -> X[0]), rows 1.. = internal pairs.
    G = jnp.concatenate([
        jnp.concatenate([stats.prev_z, stats.prev_u])[None],
        jnp.concatenate([Z_all[:-1], U[:-1]], axis=1),
    ], axis=0)                                   # (N, d+r)
    Y = Z_all                                    # (N, d)
    # Pair ages within this update: row i is the (N-1-i)-th newest; the
    # boundary row's exponent is correct whether or not it is valid (it is
    # masked to weight 0 when invalid, and the remaining pairs' ages are
    # unchanged by its absence — see the m accounting below).
    ages = jnp.arange(N - 1, -1, -1, dtype=stats.gram.dtype)
    valid = jnp.ones((N,), stats.gram.dtype).at[0].set(stats.prev_valid)
    w = valid * lam ** ages                      # (N,)
    sw = jnp.sqrt(w)[:, None]
    Gw = G * sw
    Yw = Y * sw
    m = (N - 1) + stats.prev_valid               # pairs added this update
    decay = lam ** m
    with jax.default_matmul_precision("highest"):
        gram = decay * stats.gram + Gw.T @ Gw
        rhs = decay * stats.rhs + Gw.T @ Yw
    return stats._replace(
        gram=gram,
        rhs=rhs,
        weight_sum=decay * stats.weight_sum + jnp.sum(w),
        prev_z=Z_all[-1],
        prev_u=U[-1],
        prev_valid=jnp.ones((), stats.gram.dtype),
    )


@jax.jit
def streaming_update_episode(stats: KoopmanStats, X, U,
                             forgetting=1.0) -> KoopmanStats:
    """Absorb a SELF-CONTAINED episode: ``X`` (N+1, n) states including
    both endpoints, ``U`` (N, r) the controls applied at ``X[:-1]``.

    Contributes exactly the N pairs ``(X[i], U[i]) -> X[i+1]`` and does
    NOT bridge a boundary pair into the next call (``prev_valid`` is
    reset) — the right call for discontiguous episodes
    (:func:`fit_multi`-style resetting excitation) and for closed-loop
    segments whose NEXT segment starts from this one's end state (the
    cross-segment pair is then the next segment's first internal pair, so
    nothing is lost or duplicated — used by
    :func:`~bluerov2_dynamics_tpu.models.control.simulate_adaptive_koopman_lqr`).
    """
    if X.shape[0] != U.shape[0] + 1:
        raise ValueError(
            f"episode update expects X (N+1, n) and U (N, r); got "
            f"X {X.shape} vs U {U.shape}")
    U_pad = jnp.concatenate(
        [jnp.asarray(U, stats.gram.dtype),
         jnp.zeros((1, U.shape[1]), stats.gram.dtype)])
    # the episode is self-contained in BOTH directions: ignore any stale
    # boundary carried in (X[0] does not continue the previous stream)
    # and carry none out
    zero = jnp.zeros((), stats.gram.dtype)
    stats = streaming_update(stats._replace(prev_valid=zero), X, U_pad,
                             forgetting)
    return stats._replace(prev_valid=zero)


@partial(jax.jit, static_argnums=(3,))
def streaming_scan(stats: KoopmanStats, X, U, chunk: int,
                   forgetting=1.0) -> KoopmanStats:
    """Feed a long contiguous recording through :func:`streaming_update`
    in equal ``chunk``-sized pieces as ONE ``lax.scan`` program (no
    per-chunk dispatch).  Trailing samples that do not fill a chunk are
    absorbed by a final unscanned update.  Equivalent to calling
    :func:`streaming_update` once on the whole recording when
    ``forgetting=1`` (and to the chunked calls for any ``forgetting``).
    """
    if chunk < 1:
        # a non-positive chunk would silently absorb nothing (negative
        # floor division skips both the scan and the tail)
        raise ValueError(f"chunk must be >= 1, got {chunk}")
    N = X.shape[0]
    n_chunks = N // chunk
    X = jnp.asarray(X, stats.gram.dtype)
    U = jnp.asarray(U, stats.gram.dtype)
    lam = jnp.asarray(forgetting, stats.gram.dtype)
    if n_chunks > 0:
        Xc = X[: n_chunks * chunk].reshape(n_chunks, chunk, -1)
        Uc = U[: n_chunks * chunk].reshape(n_chunks, chunk, -1)

        def body(s, xu):
            return streaming_update(s, xu[0], xu[1], lam), None

        stats, _ = jax.lax.scan(body, stats, (Xc, Uc))
    if N > n_chunks * chunk:
        stats = streaming_update(stats, X[n_chunks * chunk:],
                                 U[n_chunks * chunk:], lam)
    return stats


@jax.jit
def streaming_finalize(stats: KoopmanStats, ridge=1e-8) -> KoopmanModel:
    """Solve the accumulated normal equations into a :class:`KoopmanModel`.

    With ``forgetting=1`` this is EXACTLY the batch :func:`fit` solve on
    the same pairs (``ridge`` is the same absolute Tikhonov weight).  With
    forgetting, ``ridge`` acts against the decayed Gram — if the stream is
    long-lived and ``lam`` close to 1, the Gram scale is ``~weight_sum``;
    scale ``ridge`` accordingly if matching a batch fit's regularisation
    strength matters.
    """
    d = stats.lift_dim
    ridge = jnp.asarray(ridge, stats.gram.dtype)
    M = _solve_normal_eqns(stats.gram, stats.rhs, ridge)
    return KoopmanModel(
        centers=stats.centers,
        gamma=stats.gamma,
        A=M[:d].T,
        B=M[d:].T,
        rbf_weights=stats.rbf_weights,
    )


@partial(jax.jit, static_argnums=(3, 6, 7, 8))
def fit_streaming(
    key,
    X,
    U,
    n_rbfs: int = 200,
    gamma: float = 1.0,
    ridge: float = 1e-8,
    chunk: int = 1024,
    kmeans_iters: int = 25,
    position_invariant: bool = False,
    forgetting: float = 1.0,
) -> KoopmanModel:
    """:func:`fit` through the streaming accumulator: k-means centers on
    the full state cloud, then :func:`streaming_scan` over ``chunk``-sized
    pieces and one :func:`streaming_finalize` solve.

    With ``forgetting=1`` this equals the batch :func:`fit` (identical
    centers and pairs; the Gram accumulates chunk-by-chunk instead of as
    one GEMM, so results agree to solve-amplified roundoff, not
    bit-for-bit — f64 to 1e-7 rel, f32 to ~1% in downstream H-metrics on
    ill-conditioned dictionaries).  With
    ``forgetting < 1`` the newest pairs dominate (RLS memory
    ``~1/(1-forgetting)`` pairs) — the model tracks plant drift within
    the recording instead of averaging over it.
    """
    weights = None
    if position_invariant:
        weights = jnp.ones(X.shape[1], X.dtype).at[:3].set(0.0)
        X_cl = X * weights
    else:
        X_cl = X
    centers, _ = kmeans(key, X_cl, n_rbfs, iters=kmeans_iters)
    stats = streaming_init(centers, gamma, input_dim=U.shape[1],
                           rbf_weights=weights, dtype=X.dtype)
    stats = streaming_scan(stats, X, U, chunk, forgetting)
    return streaming_finalize(stats, ridge)


# ---------------------------------------------------------------------------
# Persistence (extension: the reference refits every run; SURVEY §5 calls
# out checkpointing the deterministic Koopman fit as the TPU equivalent of
# its torch save/load flow)
# ---------------------------------------------------------------------------

def save_model(path, model: KoopmanModel) -> None:
    """Save a fitted model as a self-describing ``.npz`` (optional fields
    included only when present)."""
    import numpy as np

    arrays = {
        "centers": np.asarray(jax.device_get(model.centers)),
        "gamma": np.asarray(jax.device_get(model.gamma)),
        "A": np.asarray(jax.device_get(model.A)),
        "B": np.asarray(jax.device_get(model.B)),
    }
    if model.decoder is not None:
        arrays["decoder"] = np.asarray(jax.device_get(model.decoder))
    if model.rbf_weights is not None:
        arrays["rbf_weights"] = np.asarray(jax.device_get(model.rbf_weights))
    import io
    import pathlib

    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    path.write_bytes(buf.getvalue())


def load_model(path, dtype=jnp.float32) -> KoopmanModel:
    """Load a model saved by :func:`save_model`."""
    import numpy as np

    with np.load(path) as z:
        return KoopmanModel(
            centers=jnp.asarray(z["centers"], dtype),
            gamma=jnp.asarray(z["gamma"], dtype),
            A=jnp.asarray(z["A"], dtype),
            B=jnp.asarray(z["B"], dtype),
            decoder=jnp.asarray(z["decoder"], dtype) if "decoder" in z else None,
            rbf_weights=(jnp.asarray(z["rbf_weights"], dtype)
                         if "rbf_weights" in z else None),
        )


# ---------------------------------------------------------------------------
# Scoring & simulation
# ---------------------------------------------------------------------------

@jax.jit
def evaluate(model: KoopmanModel, X, U):
    """One-step RMSE in state space (``koopmanEDMDc.py:157-170``)."""
    Z = lift(model, X[:-1])
    # HIGHEST matmul precision: lifted states carry raw state entries
    # (psi can be tens of rads on unwrapped recordings); the TPU-default
    # bf16 passes lose ~0.4% relative, swamping sub-1e-2 RMSE metrics.
    # Round-4 measured A/B on the pseudo recording (H=100, v5e; see
    # bench --section mxu): default-bf16 rmse 0.2069 (WRONG) vs HIGH
    # 0.140447 vs HIGHEST 0.140483 — HIGH matches to 2.6e-4 rel but only
    # buys 11% on this K=512 shape, so propagation stays HIGHEST.
    with jax.default_matmul_precision("highest"):
        Z_next = Z @ model.A.T + U[:-1] @ model.B.T
    return rmse(X[1:], decode(model, Z_next))


def _matrix_power_T(A_T, H: int, precision: str):
    """``A_T ** H`` by repeated squaring (⌈log2 H⌉ squarings + popcount
    multiplies ≈ 13 GEMMs at H=100 instead of 100).  ``H`` is a static
    Python int ≥ 1."""
    with jax.default_matmul_precision(precision):
        result, base, h = None, A_T, H
        while h:
            if h & 1:
                result = base if result is None else result @ base
            h >>= 1
            if h:
                base = base @ base
    return result


def _endpoint_conv(Z0, U, A_T, B_T, H: int, n_start: int, precision: str):
    """Endpoint of the affine lifted recurrence as ONE batched GEMM.

    ``z_H = z_0 A_Tᴴ + Σ_{j<H} u_j (B_T A_T^{H-1-j})`` — with constant
    (A, B) the H-step propagation is a convolution of the control window
    with precomputed kernels, so the (n_start, d) × H sequential GEMM
    chain of the scan path collapses into ``(n_start, H·r) @ (H·r, d)``
    plus one ``(n_start, d) @ (d, d)``.  Mathematically identical to the
    scan (tests pin 1e-9 rel agreement in f64; f32 reassociation differs
    at a few 1e-4 rel over 50-100 steps).  Measured on v5e at the bench
    shape (H=100, d=512, 9.2k starts, HIGHEST): scan 22.2-23.8 ms vs
    conv 2.6-4.0 ms chained — **5.9-8.5× across captures** — with
    5.1e-6 rel RMSE agreement, because the big GEMMs are no longer
    serialized along H (bench row ``koopman_h100_eval_conv_device_seconds``).
    """
    # K[k] = B_T @ A_T^k for k = 0..H-1 (tiny (r, d) @ (d, d) chain).
    def kstep(W, _):
        with jax.default_matmul_precision(precision):
            return W @ A_T, W

    _, K = jax.lax.scan(kstep, B_T, None, length=H)
    K = K[::-1]                              # step j uses A_T^(H-1-j)
    # Control windows U[t : t+H] for every start, as H static slices.
    U_win = jnp.stack(
        [jax.lax.dynamic_slice_in_dim(U, j, n_start, axis=0)
         for j in range(H)], axis=1)         # (n_start, H, r)
    P = _matrix_power_T(A_T, H, precision)
    with jax.default_matmul_precision(precision):
        return Z0 @ P + U_win.reshape(n_start, -1) @ K.reshape(-1, K.shape[-1])


@partial(jax.jit, static_argnums=(3, 4, 5, 6))
def multistep_rmse(model: KoopmanModel, X, U, H: int = 10,
                   precision: str = "highest", post_decode=None,
                   method: str = "scan"):
    """Endpoint H-step RMSE over all N-H starts (``koopmanEDMDc.py:172-200``).

    All starts are lifted once and propagated together; the default scan
    path's step t consumes the contiguous input slice ``U[t : t+n_start]``
    (no (n_start, H, r) gather materialisation as in the reference —
    ``method="conv"`` deliberately DOES build that window array to feed
    one batched GEMM, ~143 MB at the 44.8k-start workload).  ``precision`` sets the
    propagation matmul precision — the default "highest" is the measured
    decision (see the note on :func:`evaluate`); bench's MXU section A/Bs
    the alternatives through this same code path.  ``post_decode`` (a
    static jittable callable) transforms the decoded predictions before
    scoring — e.g. ``fossen.renormalize_quat13`` for the quaternion
    workload, which scores renormalized predictions
    (``train_tank_brov2_wrench_quat.py:466-467``).

    ``method`` selects the propagation algorithm: ``"scan"`` (default —
    the reference-faithful step recurrence, H sequential GEMMs) or
    ``"conv"`` (:func:`_endpoint_conv` — the same affine endpoint as one
    batched control-convolution GEMM, measured 5.9-8.5× faster at H=100
    on v5e; agreement with the scan path is pinned by tests and the
    bench A/B row).  The default stays "scan" so blessed RESULTS tables
    are reproduced bit-for-bit; "conv" shifts RMSEs by ~5e-6 relative.
    """
    if method not in ("scan", "conv"):
        raise ValueError(f"method must be 'scan' or 'conv', got {method!r}")
    N = X.shape[0]
    n_start = N - H
    if n_start <= 0:  # static shape check; reference returns NaN here
        return jnp.asarray(jnp.nan, X.dtype)
    Z = lift(model, X[:n_start])
    A_T, B_T = model.A.T, model.B.T

    if H == 0:
        pass  # zero-length propagation: reconstruction RMSE (both methods)
    elif method == "conv":
        Z = _endpoint_conv(Z, U, A_T, B_T, H, n_start, precision)
    else:
        def body(Z, t):
            u_t = jax.lax.dynamic_slice_in_dim(U, t, n_start, axis=0)
            with jax.default_matmul_precision(precision):
                return Z @ A_T + u_t @ B_T, None

        Z, _ = jax.lax.scan(body, Z, jnp.arange(H))
    pred = decode(model, Z)
    if post_decode is not None:
        pred = post_decode(pred)
    return rmse(X[H:], pred)


@jax.jit
def simulate(model: KoopmanModel, x0, U_seq):
    """Open-loop rollout from ``x0`` under inputs ``U_seq`` (T, r).

    Returns ``(T+1, n)`` predictions, x0 in row 0.  As in the reference
    (``koopmanEDMDc.py:202-216``), the lifted state ``z`` propagates
    without re-lifting; the decode is a readout per step.  Batched x0
    ``(B, n)`` with ``U_seq`` ``(T, B, r)`` also works.
    """
    z0 = lift(model, x0)

    def body(z, u):
        with jax.default_matmul_precision("highest"):  # see multistep note
            z = z @ model.A.T + u @ model.B.T
        return z, decode(model, z)

    _, xs = jax.lax.scan(body, z0, U_seq)
    return jnp.concatenate([x0[None], xs], axis=0)


# ---------------------------------------------------------------------------
# Hyperparameter sweeps (TPU-native extension)
# ---------------------------------------------------------------------------

def fit_sweep(
    key,
    X,
    U,
    n_rbfs: int = 200,
    gammas=(0.5, 1.0, 3.0),
    ridges=(1e-6, 1e-3, 1e-1),
    kmeans_iters: int = 25,
    position_invariant: bool = False,
):
    """Fit every (gamma, ridge) combination in one vmapped solve.

    The RBF centers are shared (k-means once); the lifts and ridge solves
    for all hyperparameter combinations run as one batched computation —
    a capability the reference's sequential scripts cannot express.
    Returns a :class:`KoopmanModel` whose leading axis indexes the
    ``len(gammas) * len(ridges)`` combinations (row-major), plus the
    ``(combo, 2)`` array of (gamma, ridge) pairs.
    """
    weights = None
    if position_invariant:
        weights = jnp.ones(X.shape[1], X.dtype).at[:3].set(0.0)
    X_cl = X * weights if weights is not None else X
    centers, _ = kmeans(key, X_cl, n_rbfs, iters=kmeans_iters)
    combos = jnp.asarray(
        [(g, r) for g in gammas for r in ridges], X.dtype
    )  # (C, 2)

    def fit_one(combo):
        gamma, ridge = combo[0], combo[1]
        Z = rbf_lift(X[:-1], centers, gamma, weights)
        Zp = rbf_lift(X[1:], centers, gamma, weights)
        m = _fit_from_blocks(Z, Zp, U[:-1], centers, gamma, ridge)
        if weights is not None:
            m = m._replace(rbf_weights=weights)
        return m

    models = jax.vmap(fit_one)(combos)
    return models, combos


def select_best(models: KoopmanModel, combos, X_val, U_val, H: int = 10,
                method: str = "scan"):
    """Score every swept model by endpoint H-step RMSE on validation data;
    returns ``(best_model, best_combo, rmses)``.

    NaN scores (a combo whose f32 Cholesky failed on an ill-conditioned
    Gram — e.g. tiny ridges with a highly-correlated dictionary) are
    treated as +inf, so one bad combo never poisons the argmin.
    ``method`` is forwarded to :func:`multistep_rmse` ("conv" scores all
    combos via the batched control-convolution endpoint — same argmin
    unless two combos are within ~1e-5 relative of each other).
    """

    def score(model):
        return multistep_rmse(model, X_val, U_val, H, method=method)

    rmses = jax.vmap(score)(models)
    finite = jnp.where(jnp.isnan(rmses), jnp.inf, rmses)
    if not bool(jnp.any(jnp.isfinite(finite))):
        raise RuntimeError(
            "every swept (gamma, ridge) combination produced a NaN model "
            "(ill-conditioned fits); increase the ridge values or reduce "
            "the dictionary size"
        )
    best = int(jnp.argmin(finite))
    best_model = jax.tree.map(lambda a: a[best], models)
    return best_model, combos[best], rmses
