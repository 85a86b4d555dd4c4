from blvm_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    PIPE_AXIS,
    SEQ_AXIS,
    batch_sharding,
    get_mesh,
    leaf_sharding,
    make_global_batch,
    make_mesh,
    maybe_initialize_distributed,
    pad_batch_to_devices,
    replicated_sharding,
    shard_batch,
    shard_examples_by_process,
)
from blvm_tpu.parallel.fsdp import (
    DEFAULT_MIN_LEAF_ELEMS,
    fsdp_shardings,
    shard_train_state_fsdp,
)
from blvm_tpu.parallel.tensor_parallel import (
    RESIDUAL_GLU_TP_RULES,
    STCN_TP_RULES,
    WAVENET_TP_RULES,
    shard_train_state,
    tree_shardings,
)
from blvm_tpu.parallel.pipeline_parallel import (
    PIPELINE_PP_RULES,
    STCNPipelineAdapter,
    WaveNetPipelineAdapter,
    from_pipeline_params,
    make_pipelined_stack,
    to_pipeline_params,
)
from blvm_tpu.parallel.multiseed import (
    load_multiseed_sweep,
    make_multiseed_eval_step,
    make_multiseed_train_step,
    multiseed_train_state,
    save_multiseed_sweep,
    slice_seed,
)
from blvm_tpu.parallel.train_step import make_eval_step, make_train_step
