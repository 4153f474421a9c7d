from .darknet import DarkNet53  # noqa: F401
from .orienmask_yolo import OrienMaskYOLO  # noqa: F401
from .orienmask_yolo_fpnplus import OrienMaskYOLOFPNPlus  # noqa: F401
from . import convert, layers  # noqa: F401
