from . import losses  # noqa: F401
from .config import LossWeights, TrainConfig, scheduled  # noqa: F401
