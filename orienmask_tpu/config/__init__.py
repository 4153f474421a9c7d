from .base import *  # noqa: F401,F403
from .config_train import *  # noqa: F401,F403
from .config_test import *  # noqa: F401,F403
from .config_infer import *  # noqa: F401,F403
