from ..ops.loss import OrienMaskYOLOLoss, OrienMaskYOLOMultiScaleLoss  # noqa: F401
from ..ops.postprocess import OrienMaskYOLOPostProcess  # noqa: F401
from .coco_eval import COCOMetrics  # noqa: F401
from .counter import EvalCounter  # noqa: F401
from . import rle  # noqa: F401
from .lite_cocoeval import COCOGroundTruth, LiteCOCOeval  # noqa: F401
