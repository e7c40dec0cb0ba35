from posediffusion_tpu.parallel.distributed import (
    maybe_initialize_distributed,
    shard_host_batch,
)
from posediffusion_tpu.parallel.mesh import (
    batch_sharding,
    fsdp_param_spec,
    make_mesh,
    param_shardings,
    replicated,
)
