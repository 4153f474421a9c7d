from .lr_scheduler import PolyLR, StepWarmUpLR, WarmupLR  # noqa: F401
from .param_groups import param_group_factors  # noqa: F401
from .sgd import SGD  # noqa: F401
