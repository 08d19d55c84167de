from dvmvs_tpu.parallel.mesh import batch_sharding, make_mesh, replicated_sharding
from dvmvs_tpu.parallel.train import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
    stage_parameter_mask,
)
