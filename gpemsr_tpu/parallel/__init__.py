from gpemsr_tpu.parallel.mesh import (
    batch_sharding, ensure_cpu_devices, make_mesh, replicate, replicated,
    shard_batch,
)
