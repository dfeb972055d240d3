"""Device-mesh parallelism: dp x tp sharding over XLA collectives."""

from stable_diffusion_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    param_spec,
    shard_params,
    data_sharding,
    replicate,
)
