"""Low-level math kernels: rotations, quaternions, integrators, lifts.

Everything in this package is a pure function over jnp arrays with
arbitrary leading batch dimensions — batching is broadcasting, not vmap.
"""

from bluerov2_dynamics_tpu.ops.rotations import (  # noqa: F401
    rotation_matrix,
    euler_kinematics_matrix,
    rotate_b2n,
    rotate_n2b,
    euler_rates,
    ssa,
)
from bluerov2_dynamics_tpu.ops.quaternion import (  # noqa: F401
    quat_conjugate,
    quat_exp,
    quat_log,
    quat_normalize,
    quat_to_rotation_matrix,
    quat_multiply,
    quat_derivative,
    euler_to_quat,
    quat_to_euler,
    quat_to_yaw,
    quat_rotate,
    quat_rotate_inv,
)
from bluerov2_dynamics_tpu.ops.integrators import (  # noqa: F401
    euler_step,
    rk4_step,
    rollout,
    rollout_stepper,
)
