from .schedule import cosine_annealing_warmup_restarts, schedule_from_cfg  # noqa: F401
from .state import TrainState, create_train_state  # noqa: F401
from .step import (  # noqa: F401
    make_image_train_step, make_scanned_train_step, make_train_step)
from .batching import RayPool, build_ray_pool  # noqa: F401
