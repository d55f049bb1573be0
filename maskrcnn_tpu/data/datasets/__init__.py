from .coco import COCODataset
from .concat import AbstractDataset, ConcatDataset, ListDataset
from .voc import PascalVOCDataset

__all__ = [
    "COCODataset",
    "ConcatDataset",
    "ListDataset",
    "AbstractDataset",
    "PascalVOCDataset",
]
