from bluerov2_dynamics_tpu.eval.metrics import (  # noqa: F401
    rmse,
    one_step_rmse,
    endpoint_rmse,
    endpoint_rmse_carry,
)
from bluerov2_dynamics_tpu.eval.timing import time_fn  # noqa: F401
