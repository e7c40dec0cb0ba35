from posediffusion_tpu.parallel.mesh import (
    batch_sharding,
    fsdp_param_spec,
    make_mesh,
    param_shardings,
    replicated,
)
