from .mesh import make_mesh, shard_batch, replicate  # noqa: F401
from .train_step import TrainState, make_train_step, make_eval_step, create_train_state  # noqa: F401
from .distributed import maybe_initialize_distributed, is_main_process, process_count  # noqa: F401
