from bluerov2_dynamics_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_along,
    replicate,
)
from bluerov2_dynamics_tpu.parallel.sharded import (  # noqa: F401
    sharded_ekf_bank,
    sharded_pf_bank,
    sharded_endpoint_rmse,
    sharded_koopman_fit,
    sharded_koopman_multistep_rmse,
    sharded_rollout_final,
    sharded_streaming_stats,
    shardmap_endpoint_rmse,
)
