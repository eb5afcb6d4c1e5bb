from .mesh import make_mesh, shard_batch, replicate  # noqa: F401
from .train_step import TrainState, make_train_step, make_eval_step, create_train_state  # noqa: F401
