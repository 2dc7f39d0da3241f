from sonicdiffusionbayeslab_tpu.parallel.distributed import (  # noqa: F401
    all_sum_array,
    all_sum_scalar,
    initialize,
)
from sonicdiffusionbayeslab_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    latent_sharding,
    make_mesh,
    param_sharding_rules,
    shard_batch,
    shard_latents,
    shard_params,
)
