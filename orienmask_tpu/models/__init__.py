from .darknet import DarkNet53  # noqa: F401
from .orienmask_yolo import OrienMaskYOLO  # noqa: F401
from .orienmask_yolo_fpnplus import OrienMaskYOLOFPNPlus  # noqa: F401
from .resnet import (  # noqa: F401
    ResNet,
    resnet18,
    resnet34,
    resnet50,
    resnet101,
    resnet152,
    resnext50_32x4d,
    resnext101_32x8d,
    wide_resnet50_2,
    wide_resnet101_2,
)
from . import convert, layers  # noqa: F401
