from bluerov2_dynamics_tpu.viz.animate import animate_topdown  # noqa: F401
from bluerov2_dynamics_tpu.viz.plots import (  # noqa: F401
    plot_coefficient_scales,
    plot_topdown_with_depth,
)
