from paig_reproduction_tpu.train.trainer import Trainer  # noqa: F401
from paig_reproduction_tpu.train.optimizers import OPTIMIZERS  # noqa: F401
