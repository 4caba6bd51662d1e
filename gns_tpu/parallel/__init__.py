from gns_tpu.parallel.mesh import make_mesh  # noqa: F401
from gns_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    make_sharded_train_step,
    shard_batch,
)
