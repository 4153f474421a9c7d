from .collate import collate, collate_plus, naive_collate  # noqa: F401
from .dataloader import AspectRatioGroupedDataloader, DataLoader  # noqa: F401
from .dataset import COCODataset, VOCDataset  # noqa: F401
from .transform import COCOTransform, FastCOCOTransform  # noqa: F401
