from gns_tpu.parallel.mesh import make_mesh  # noqa: F401
from gns_tpu.parallel.pipeline import make_pipelined_forward  # noqa: F401
from gns_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    make_sharded_train_step,
    shard_batch,
)
from gns_tpu.parallel.tensor_parallel import (  # noqa: F401
    make_tp_train_step,
    shard_params_tp,
    tp_init_train_state,
)
