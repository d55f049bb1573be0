from .boxlist import FLIP_LEFT_RIGHT, FLIP_TOP_BOTTOM, BoxList
from .boxlist_ops import boxlist_iou, boxlist_nms, cat_boxlist, remove_small_boxes
from .image_list import ImageList, to_image_list
from .keypoints import Keypoints, PersonKeypoints
from .segmentation_mask import (
    BinaryMaskList,
    PolygonInstance,
    PolygonList,
    SegmentationMask,
)
