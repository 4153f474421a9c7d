from .boxes import anchor_ious, bbox_ious  # noqa: F401
from .loss import OrienMaskYOLOLoss, OrienMaskYOLOMultiScaleLoss  # noqa: F401
from .nms import batched_class_nms, greedy_nms_select, nms_keep_mask  # noqa: F401
from .postprocess import OrienMaskYOLOPostProcess  # noqa: F401
from .targets import TargetBuilder  # noqa: F401
