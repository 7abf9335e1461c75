from bluerov2_dynamics_tpu.utils.checkpoint import save_pytree, load_pytree  # noqa: F401
from bluerov2_dynamics_tpu.utils.log import info, ok, warn, err  # noqa: F401
