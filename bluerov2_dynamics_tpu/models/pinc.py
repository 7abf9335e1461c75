"""PINc: physics-informed residual one-step dynamics network (flax/optax).

Rebuild of the reference PINc stack
(``/root/reference/training/train_tank_brov2_full_comparison.py:598-888``):
a residual integrator ``x_{k+1} = x_k + f_theta([x_k, u_k, dt])`` on the
reduced 9-state ``[x, y, z, cos(psi), sin(psi), u, v, w, r]`` with 4-input
body wrench ``[X, Y, Z, Mz]``; MLP (64,64,64,64) with learnable-beta
AdaptiveSoftplus + LayerNorm, a yaw-rotated xy residual head, and cos/sin
renormalization.  Training: AdamW(3e-3) + global-norm clip 5.0, loss =
MSE + 0.5 * physics residual + multi-step rollout loss.

Documented deviations from the reference (both improve the model; the
reference PINc run diverged, ``training/best_results.txt:793``):

1. The reference computes the physics loss under ``@torch.no_grad``
   (``train_tank_brov2_full_comparison.py:747-757``), which makes it a
   *constant* added to the loss — it contributes no gradient at all.  Here
   the physics loss participates in the gradient by default;
   ``physics_stop_gradient=True`` reproduces the reference behavior.
2. The reference rollout loss treats the rows of a *shuffled* minibatch as
   consecutive transitions (``:760-787`` fed from a shuffled DataLoader,
   ``:809``) — i.e. it rolls out across unrelated samples.  Here the
   rollout loss uses genuine consecutive windows sampled from the
   trajectory.

The training loop is fully jitted: one ``lax.scan`` over minibatches per
epoch, all data resident on device.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from bluerov2_dynamics_tpu.models.fossen import reduced_rhs
from bluerov2_dynamics_tpu.models.params import (
    LagParams,
    ReducedParams,
    ThrusterConfig,
    reduced_params,
)
from bluerov2_dynamics_tpu.models.thrusters import static_thrust, lag_step, wrench_from_thrust


# ---------------------------------------------------------------------------
# State conversions 12D <-> 9D (train_tank_brov2_full_comparison.py:612-645)
# ---------------------------------------------------------------------------

def state12_to_9(x12):
    """``[x,y,z,phi,theta,psi,u,v,w,p,q,r] -> [x,y,z,cos psi,sin psi,u,v,w,r]``
    — batched (the reference converts row by row)."""
    psi = x12[..., 5]
    return jnp.concatenate(
        [
            x12[..., 0:3],
            jnp.stack([jnp.cos(psi), jnp.sin(psi)], axis=-1),
            x12[..., 6:9],
            x12[..., 11:12],
        ],
        axis=-1,
    )


def state9_to_12(x9):
    """Inverse embedding for metrics/plots: phi, theta, p, q are zeroed,
    exactly as the reference does (``:630-641``) — those channels therefore
    contribute their true values to the 12D RMSE."""
    psi = jnp.arctan2(x9[..., 4], x9[..., 3])
    zeros2 = jnp.zeros_like(x9[..., 0:2])
    return jnp.concatenate(
        [
            x9[..., 0:3],
            zeros2,
            psi[..., None],
            x9[..., 5:8],
            zeros2,
            x9[..., 8:9],
        ],
        axis=-1,
    )


def wrench4_from_thrusters(cfg: ThrusterConfig, lag: LagParams, U8):
    """Map a whole thruster-command trajectory to 4D body wrenches.

    The reference maps row-by-row through a *stateful* thruster model, so
    the wrench dataset is lag-filtered sequentially along the trajectory
    (``train_tank_brov2_full_comparison.py:601-609, 724-744``).  Here that
    is one explicit ``lax.scan`` over time with the lag state as carry.
    ``U8``: ``(T, 8)`` -> returns ``(T, 4)`` = [Fx, Fy, Fz, Mz].
    """

    def body(lag_state, u8):
        new_state, F_dyn = lag_step(lag, lag_state, static_thrust(cfg, u8))
        tau6 = wrench_from_thrust(cfg, F_dyn)
        return new_state, tau6[..., jnp.array([0, 1, 2, 5])]

    lag0 = jnp.zeros((8, 3), U8.dtype)
    _, U4 = jax.lax.scan(body, lag0, U8)
    return U4


# ---------------------------------------------------------------------------
# Network
# ---------------------------------------------------------------------------

class AdaptiveSoftplus(nn.Module):
    """softplus(beta * x) / beta with a learnable scalar beta
    (``train_tank_brov2_full_comparison.py:648-654``)."""

    beta_init: float = 1.0

    @nn.compact
    def __call__(self, x):
        beta = self.param("beta", lambda _: jnp.asarray(self.beta_init, x.dtype))
        return jax.nn.softplus(beta * x) / (beta + 1e-12)


class PINcNet(nn.Module):
    """Residual one-step integrator on the reduced 9-state.

    Input ``z = [x9, u4, dt]`` of width 14; output = next 9-state.  The xy
    residual is rotated body->world by the current yaw and the (cos, sin)
    pair is renormalized (``train_tank_brov2_full_comparison.py:657-721``).

    ``norm_mu`` / ``norm_sigma`` (tuples of 14 floats) optionally
    standardize the MLP input — an improvement over the reference, whose
    network ingests raw unbounded world positions (a likely contributor to
    its diverged training run, ``best_results.txt:793``).  The residual
    head still operates on the un-normalized state.
    """

    hidden: Sequence[int] = (64, 64, 64, 64)
    norm_mu: Optional[tuple] = None
    norm_sigma: Optional[tuple] = None
    position_invariant: bool = False
    # torch nn.LayerNorm uses eps=1e-5 (flax default is 1e-6); weights
    # imported from the reference's .pt checkpoint set this to 1e-5 so the
    # forward pass matches torch bit-for-bit up to float math
    ln_eps: float = 1e-6

    @nn.compact
    def __call__(self, z):
        h = z
        if self.position_invariant:
            # mask world position from the MLP input: the hydrodynamics do
            # not depend on x, y, z, and feeding unbounded drifting
            # positions makes the network extrapolate off its training
            # cloud (improvement over the reference architecture; the
            # position channels are still integrated via the residual head)
            h = h * jnp.asarray([0.0] * 3 + [1.0] * 11, z.dtype)
        if self.norm_mu is not None:
            mu = jnp.asarray(self.norm_mu, z.dtype)
            sigma = jnp.asarray(self.norm_sigma, z.dtype)
            h = (h - mu) / sigma
        for width in self.hidden:
            h = nn.Dense(width)(h)
            h = AdaptiveSoftplus()(h)
            h = nn.LayerNorm(epsilon=self.ln_eps)(h)
        dx = nn.Dense(9)(h)

        x9 = z[..., :9]
        cpsi, spsi = z[..., 3], z[..., 4]
        dx_wx = cpsi * dx[..., 0] - spsi * dx[..., 1]
        dx_wy = spsi * dx[..., 0] + cpsi * dx[..., 1]
        base = x9 + dx
        c, s = base[..., 3], base[..., 4]
        norm = jnp.maximum(jnp.sqrt(c * c + s * s), 1e-6)
        return jnp.concatenate(
            [
                (x9[..., 0] + dx_wx)[..., None],
                (x9[..., 1] + dx_wy)[..., None],
                base[..., 2:3],
                (c / norm)[..., None],
                (s / norm)[..., None],
                base[..., 5:9],
            ],
            axis=-1,
        )


def init_params(
    key,
    hidden: Sequence[int] = (64, 64, 64, 64),
    dtype=jnp.float32,
    norm_mu=None,
    norm_sigma=None,
    position_invariant: bool = False,
    ln_eps: float = 1e-6,
):
    net = PINcNet(
        hidden=tuple(hidden),
        norm_mu=None if norm_mu is None else tuple(float(v) for v in norm_mu),
        norm_sigma=None if norm_sigma is None else tuple(float(v) for v in norm_sigma),
        position_invariant=position_invariant,
        ln_eps=ln_eps,
    )
    params = net.init(key, jnp.zeros((1, 14), dtype))
    return net, params


def load_torch_checkpoint(path, hidden: Sequence[int] = (64, 64, 64, 64),
                          dtype=jnp.float32, allow_full_unpickle: bool = False):
    """Import a reference PINc ``state_dict`` checkpoint into flax params.

    The reference ships exactly one trained artifact —
    ``/root/reference/models/pinc_best.pt``, consumed by its load-or-train
    flow (``train_tank_brov2_full_comparison.py:948-969``).  Its
    ``nn.Sequential`` repeats ``[Linear, AdaptiveSoftplus, LayerNorm]`` per
    hidden layer plus a final ``Linear`` (``:657-679``), so the state-dict
    keys are ``net.{3i}.weight/.bias`` (Linear), ``net.{3i+1}.beta``
    (softplus), ``net.{3i+2}.weight/.bias`` (LayerNorm), and
    ``net.{3L}.weight/.bias`` for the output layer.  Mapping: torch Linear
    stores ``(out, in)`` — transposed into flax's ``(in, out)`` kernel;
    LayerNorm weight/bias become scale/bias; betas map one-to-one.

    Returns ``(net, params)`` with identity input normalization and
    ``ln_eps=1e-5`` (torch's LayerNorm epsilon).  Requires ``torch`` (CPU
    build is fine) to unpickle the checkpoint.
    """
    import pickle

    import numpy as onp
    import torch

    try:
        sd = torch.load(str(path), map_location="cpu", weights_only=True)
    except pickle.UnpicklingError:
        # The safe weights-only load refuses anything that isn't a plain
        # tensor state_dict (e.g. a fully pickled nn.Module).  Full
        # unpickling executes arbitrary code from the file, so it needs an
        # explicit opt-in; everything else (corrupt file, IO error) is
        # re-raised as-is.
        if not allow_full_unpickle:
            raise ValueError(
                f"{path} is not a weights-only checkpoint; pass "
                "allow_full_unpickle=True to fully unpickle it (runs "
                "arbitrary code from the file — only for trusted files)"
            )
        sd = torch.load(str(path), map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()

    def arr(key, transpose=False):
        t = onp.asarray(sd[key].detach().cpu().numpy())
        return jnp.asarray(t.T if transpose else t, dtype)

    n_hidden = len(tuple(hidden))
    params = {}
    for i in range(n_hidden):
        params[f"Dense_{i}"] = {
            "kernel": arr(f"net.{3 * i}.weight", transpose=True),
            "bias": arr(f"net.{3 * i}.bias"),
        }
        params[f"AdaptiveSoftplus_{i}"] = {"beta": arr(f"net.{3 * i + 1}.beta")}
        params[f"LayerNorm_{i}"] = {
            "scale": arr(f"net.{3 * i + 2}.weight"),
            "bias": arr(f"net.{3 * i + 2}.bias"),
        }
    params[f"Dense_{n_hidden}"] = {
        "kernel": arr(f"net.{3 * n_hidden}.weight", transpose=True),
        "bias": arr(f"net.{3 * n_hidden}.bias"),
    }
    params = {"params": params}

    net, ref_params = init_params(
        jax.random.PRNGKey(0), hidden, dtype=dtype, ln_eps=1e-5
    )
    ref_shapes = jax.tree.map(jnp.shape, ref_params)
    got_shapes = jax.tree.map(jnp.shape, params)
    if ref_shapes != got_shapes:
        raise ValueError(
            f"checkpoint {path} does not match PINcNet(hidden={tuple(hidden)}): "
            f"expected {ref_shapes}, got {got_shapes}"
        )
    return net, params


def input_stats(z, eps: float = 1e-6):
    """Per-column mean/std of the training inputs for :class:`PINcNet`
    normalization (std floored at ``eps`` — the constant dt column)."""
    mu = jnp.mean(z, axis=0)
    sigma = jnp.maximum(jnp.std(z, axis=0), eps)
    return np.asarray(jax.device_get(mu)), np.asarray(jax.device_get(sigma))


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------

def mse_loss(pred, target):
    d = pred - target
    return jnp.mean(d * d)


def physics_loss(rp: ReducedParams, x_next_pred, u4, stop_gradient: bool = False):
    """Penalize the norm of the continuous reduced RHS at the predicted next
    state (``train_tank_brov2_full_comparison.py:747-757``).  With
    ``stop_gradient=True`` this reproduces the reference's ``no_grad``
    semantics (a constant w.r.t. the parameters)."""
    val = jnp.mean(reduced_rhs(rp, x_next_pred, u4) ** 2)
    return jax.lax.stop_gradient(val) if stop_gradient else val


def rollout_loss(net: PINcNet, params, z_windows, steps: int):
    """Multi-step open-loop loss over consecutive windows.

    ``z_windows``: ``(B, steps+1, 14)`` consecutive rows ``[x9, u4, dt]``.
    From each window's first state, roll the model ``steps`` steps using the
    recorded inputs and penalize per-step MSE against the recorded states.
    """
    x = z_windows[:, 0, :9]
    dt_col = z_windows[:, 0, 13:14]

    def body(x, i):
        z_i = jnp.concatenate([x, z_windows[:, i, 9:13], dt_col], axis=-1)
        x_next = net.apply(params, z_i)
        step_mse = mse_loss(x_next, z_windows[:, i + 1, :9])
        return x_next, step_mse

    _, losses = jax.lax.scan(body, x, jnp.arange(steps))
    return jnp.mean(losses)


# ---------------------------------------------------------------------------
# Dataset & training
# ---------------------------------------------------------------------------

class PINcData(NamedTuple):
    z: jnp.ndarray   # (N-1, 14) [x9_k, u4_k, dt]
    y: jnp.ndarray   # (N-1, 9)  x9_{k+1}
    u4: jnp.ndarray  # (N-1, 4)


def make_dataset(X12, U8, dt, cfg: ThrusterConfig, lag: LagParams) -> PINcData:
    """(x9_k, u4_k, dt) -> x9_{k+1} training pairs
    (``train_tank_brov2_full_comparison.py:724-744``)."""
    X9 = state12_to_9(X12)
    U4 = wrench4_from_thrusters(cfg, lag, U8)
    dts = jnp.full((X9.shape[0] - 1, 1), dt, X9.dtype)
    z = jnp.concatenate([X9[:-1], U4[:-1], dts], axis=-1)
    return PINcData(z=z, y=X9[1:], u4=U4[:-1])


class TrainConfig(NamedTuple):
    epochs: int = 200
    batch: int = 256
    lr: float = 3e-3
    clip_norm: float = 5.0
    physics_weight: float = 0.5
    physics_stop_gradient: bool = False
    rollout_steps: int = 10
    rollout_windows: int = 16   # windows per batch for the rollout loss
    rollout_weight: float = 1.0
    normalize: bool = False     # standardize MLP inputs (improvement; see PINcNet)
    position_invariant: bool = False  # mask x,y,z from the MLP input (improvement)
    lr_schedule: str = "const"  # "const" (reference) or "cosine" (improvement)


def make_optimizer(tc: TrainConfig, total_steps: int | None = None):
    """AdamW + global-norm clip (``train_tank_brov2_full_comparison.py:790-835``).

    ``lr_schedule='cosine'`` (improvement, default off) adds 5% linear
    warmup and cosine decay to ``0.01 * lr`` over ``total_steps``.
    """
    if tc.lr_schedule == "cosine" and total_steps:
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=tc.lr,
            warmup_steps=max(total_steps // 20, 1),
            decay_steps=total_steps,
            end_value=0.01 * tc.lr,
        )
    else:
        lr = tc.lr
    return optax.chain(
        optax.clip_by_global_norm(tc.clip_norm),
        optax.adamw(lr),
    )


def train(
    key,
    data: PINcData,
    tc: TrainConfig = TrainConfig(),
    hidden: Sequence[int] = (64, 64, 64, 64),
    rp: ReducedParams | None = None,
    log_every: int = 0,
    mesh=None,
):
    """Train PINc; returns ``(net, params, loss_history)``.

    The whole epoch (shuffle, minibatch scan, rollout windows) runs inside
    one jitted function; the Python loop is only over epochs.

    ``mesh`` (a ``jax.sharding.Mesh``) enables data-parallel training:
    params/optimizer state are replicated and every minibatch (and the
    rollout windows, when divisible) is sharded over the mesh's first
    axis inside the jitted epoch — XLA's GSPMD partitioner inserts the
    gradient all-reduce.  The loss trajectory is bit-compatible with the
    single-device run up to f32 reduction-order effects (asserted on an
    8-device CPU mesh in ``tests/test_pinc.py``).  The reference trains
    strictly single-process torch-CPU
    (``train_tank_brov2_full_comparison.py:790-835``).
    """
    if rp is None:
        rp = reduced_params(dtype=data.z.dtype)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        axis = mesh.axis_names[0]
        n_dev = mesh.shape[axis]  # batch shards over the FIRST mesh axis

        def shard_batch(t):
            # shard the leading (batch/window) axis when divisible,
            # otherwise leave the layout to the partitioner
            if t.shape[0] % n_dev:
                return t
            spec = PartitionSpec(axis, *([None] * (t.ndim - 1)))
            return jax.lax.with_sharding_constraint(
                t, NamedSharding(mesh, spec))

        replicate = lambda t: jax.device_put(
            t, NamedSharding(mesh, PartitionSpec()))
    else:
        shard_batch = lambda t: t
        replicate = lambda t: t
    key, init_key = jax.random.split(key)
    if tc.normalize:
        mu, sigma = input_stats(data.z)
    else:
        mu, sigma = np.zeros(14), np.ones(14)  # identity (bit-equal to no norm)
    net, params = init_params(
        init_key, hidden, dtype=data.z.dtype, norm_mu=mu, norm_sigma=sigma,
        position_invariant=tc.position_invariant,
    )
    N = data.z.shape[0]
    # clamp to the dataset size: N < tc.batch previously reshaped a short
    # permutation into (1, tc.batch) and crashed inside the jitted epoch
    batch = min(tc.batch, N)
    if mesh is not None and batch % n_dev:
        raise ValueError(
            f"effective batch {batch} (min(tc.batch={tc.batch}, N={N})) "
            f"must divide over the {n_dev}-way {axis!r} mesh axis")
    n_batches = max(N // batch, 1)
    opt = make_optimizer(tc, total_steps=tc.epochs * n_batches)
    opt_state = opt.init(params)
    params, opt_state = replicate(params), replicate(opt_state)
    data = PINcData(*(replicate(t) for t in data))
    use_rollout = tc.rollout_weight > 0 and tc.rollout_steps > 0 and N > tc.rollout_steps + 1

    def loss_fn(params, z_b, y_b, u4_b, z_win):
        pred = net.apply(params, z_b)
        loss = mse_loss(pred, y_b)
        if tc.physics_weight > 0:
            loss = loss + tc.physics_weight * physics_loss(
                rp, pred, u4_b, tc.physics_stop_gradient
            )
        if use_rollout:
            loss = loss + tc.rollout_weight * rollout_loss(
                net, params, z_win, tc.rollout_steps
            )
        return loss

    @jax.jit
    def epoch(params, opt_state, key):
        key, pkey, wkey = jax.random.split(key, 3)
        perm = jax.random.permutation(pkey, N)[: n_batches * batch]
        perm = perm.reshape(n_batches, batch)
        # consecutive-window starts for the rollout loss, one set per batch
        starts = jax.random.randint(
            wkey, (n_batches, tc.rollout_windows), 0, max(N - tc.rollout_steps - 1, 1)
        )
        win_idx = starts[..., None] + jnp.arange(tc.rollout_steps + 1)  # (nb, W, S+1)

        def step(carry, inputs):
            params, opt_state = carry
            idx, widx = inputs
            z_win = shard_batch(data.z[widx])  # (W, S+1, 14)
            loss, grads = jax.value_and_grad(loss_fn)(
                params,
                shard_batch(data.z[idx]),
                shard_batch(data.y[idx]),
                shard_batch(data.u4[idx]),
                z_win,
            )
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), (perm, win_idx)
        )
        return params, opt_state, key, jnp.mean(losses)

    # Pipelined epoch dispatch: the per-epoch `float(mean_loss)` readback
    # used to synchronize the (tunneled) host with the device EVERY
    # epoch.  Epochs chain through their (params, opt_state, key) data
    # dependency, so the host can enqueue ahead and read the losses back
    # once at the end; a bounded readback every 50 epochs keeps the
    # device queue shallow (the runbook's unconsumed-backlog guard).
    # Measured: the epoch itself is device-bound (~190 ms at the flagship
    # shape — small-matmul SGD, reference semantics), so this removes
    # only the per-epoch sync latency (warm 200-epoch run 38.8 s, the
    # low end of the blessed 39-82 s band; not separable from day-to-day
    # tunnel drift).  The epoch program is unchanged, so the loss history
    # and final params are bit-identical to the per-epoch-sync loop
    # (determinism re-confirmed on TPU after the change).
    from bluerov2_dynamics_tpu.eval.timing import sync

    history = []  # device scalars until the final readback
    for ep in range(tc.epochs):
        params, opt_state, key, mean_loss = epoch(params, opt_state, key)
        history.append(mean_loss)
        if log_every and (ep + 1) % log_every == 0:
            print(f"[PINc] epoch {ep + 1:4d}/{tc.epochs} | "
                  f"loss ~ {float(mean_loss):.6f}")
        elif (ep + 1) % 50 == 0:
            # per-DEVICE readback barrier: under mesh DP a replicated
            # scalar has one shard per device, and float() would only
            # drain shard 0's stream (eval/timing.py:sync docstring)
            sync(mean_loss)
    if history:  # epochs=0 returns [] (jnp.stack rejects empty lists)
        # chunked stack: one op with tc.epochs operands would scale
        # trace/compile cost with epoch count (and can hit XLA operand
        # limits for very long runs); 512-operand chunks keep the
        # single-pass readback win with a bounded op size
        history = [
            float(x)
            for i in range(0, len(history), 512)
            for x in np.asarray(jnp.stack(history[i:i + 512]))
        ]
    return net, params, history


# ---------------------------------------------------------------------------
# Rollout & metrics
# ---------------------------------------------------------------------------

def make_step(net: PINcNet, params, dt):
    """Discrete 9-state step ``step(x9_batch, u4_batch) -> x9_batch``."""

    def step(x9, u4):
        dt_col = jnp.full((*x9.shape[:-1], 1), dt, x9.dtype)
        z = jnp.concatenate([x9, u4, dt_col], axis=-1)
        return net.apply(params, z)

    return step


def simulate(net, params, x0_12, U4_seq, dt):
    """Open-loop rollout; returns ``(T+1, 12)`` via the 9->12 embedding
    (``train_tank_brov2_full_comparison.py:838-862``)."""
    from bluerov2_dynamics_tpu.ops.integrators import rollout

    step = make_step(net, params, dt)
    x9_0 = state12_to_9(x0_12)
    _, traj9 = rollout(step, x9_0, U4_seq)
    traj12 = state9_to_12(traj9)
    return jnp.concatenate([jnp.asarray(x0_12)[None], traj12], axis=0)


@partial(jax.jit, static_argnums=(0, 5, 6))
def endpoint_rmse(net, params, X12, U4, dt, H: int, psi_error: str = "raw"):
    """Endpoint H-step RMSE in 12D projection over all starts
    (``train_tank_brov2_full_comparison.py:865-888``): start states are
    converted 12->9 once, rolled out in 9D, and the endpoints are embedded
    back to 12D (zeroed phi/theta/p/q) before scoring.

    Measurement caveat inherited from the reference: the 9->12 embedding
    recovers psi via atan2 (wrapped to [-pi, pi]) while recorded datasets
    store *unwrapped* psi (e.g. 1217 deg in the reference tank run), so the
    psi channel contributes 2*pi*k errors that dwarf the model error — a
    large part of the reference's reported PINc "divergence"
    (``best_results.txt:793``).  ``psi_error='raw'`` (default) reproduces
    the reference metric; ``'ssa'`` scores the psi channel by smallest
    signed angle instead.
    """
    from bluerov2_dynamics_tpu.eval.metrics import rmse
    from bluerov2_dynamics_tpu.ops.rotations import ssa

    if psi_error not in ("raw", "ssa"):
        # a typo ("SSA", "wrapped") must not silently fall back to the
        # raw-psi metric whose whole point is that it differs by 2*pi*k
        raise ValueError(f"psi_error must be 'raw' or 'ssa', got {psi_error!r}")
    N = X12.shape[0]
    n_start = N - H
    if n_start <= 0:  # reference evaluators return NaN for H >= N
        return jnp.asarray(jnp.nan, X12.dtype)
    step = make_step(net, params, dt)

    def body(x9, t):
        u_t = jax.lax.dynamic_slice_in_dim(U4, t, n_start, axis=0)
        return step(x9, u_t), None

    x9, _ = jax.lax.scan(body, state12_to_9(X12[:n_start]), jnp.arange(H))
    pred = state9_to_12(x9)
    if psi_error == "ssa":
        err = pred - X12[H:]
        err = err.at[..., 5].set(ssa(err[..., 5]))
        return jnp.sqrt(jnp.mean(err * err))
    return rmse(X12[H:], pred)
