from blvm_tpu.parallel.mesh import (
    batch_sharding,
    get_mesh,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from blvm_tpu.parallel.train_step import make_eval_step, make_train_step
