from . import envs, timer  # noqa: F401
from .visualizer import InferenceVisualizer  # noqa: F401
