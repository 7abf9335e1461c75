"""bluerov2_dynamics_tpu — a TPU-native BlueROV2 dynamics framework.

A ground-up JAX/XLA rebuild of the capabilities of the reference
``ViktorNfa/bluerov2_dynamics`` research codebase: Fossen 6-DOF physics
(thruster-, wrench- and quaternion-state variants), Koopman EDMDc system
identification, learned double-integrator and physics-informed residual
network (PINc) models, batched integrators, multi-step evaluation, data
ingestion and visualization — all designed TPU-first:

* every dynamics function is a pure, natively **batched** function over
  arrays with arbitrary leading batch dimensions (no Python loops);
* time stepping is ``lax.scan``, batching is broadcasting (or ``vmap``),
  multi-chip scale-out is ``jax.sharding`` over a device mesh;
* stateful pieces of the reference (thruster lag filters) are explicit
  state threaded through the scan carry;
* host-side work (CSV/rosbag ingestion, plotting) stays on host; arrays
  live in HBM.

See SURVEY.md at the repo root for the complete map from reference
components to this package.
"""

__version__ = "0.1.0"

from bluerov2_dynamics_tpu.models.params import (  # noqa: F401
    FossenParams,
    ReducedParams,
    ThrusterConfig,
    LagParams,
)
