"""Device mesh, shardings and collectives for SPMD training."""

from clipa_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    batch_sharding,
    replicated_sharding,
    fsdp_shardings,
    local_batch_to_global,
)
