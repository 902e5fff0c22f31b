from .mesh import make_mesh, replicated, batch_sharding  # noqa: F401
from .trainer import TrainerModules, TrainState, create_train_state, make_train_step  # noqa: F401
