from mvae_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_params_tp,
    shard_batch_dp,
)
