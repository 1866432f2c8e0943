from .mesh import make_mesh, shard_batch
from .train_step import TrainState, make_train_step, make_eval_step
