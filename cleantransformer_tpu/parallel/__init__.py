from cleantransformer_tpu.parallel.mesh import make_mesh, use_mesh, active_mesh  # noqa: F401
from cleantransformer_tpu.parallel.sharding import (  # noqa: F401
    shard_hint, param_specs, named_sharding, shard_params, shard_params_zero,
    replicate,
)
