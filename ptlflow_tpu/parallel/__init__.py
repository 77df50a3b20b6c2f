from .mesh import (make_mesh, data_sharding, replicated, shard_batch,
                   shard_spatial, init_distributed)
from .train import (
    onecycle_linear, make_optimizer, TrainState, create_train_state,
    build_train_step,
)
