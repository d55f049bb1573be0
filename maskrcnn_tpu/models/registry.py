"""Model component registries (reference modeling/registry.py:5-12).

Extension hook: register a custom meta-architecture / backbone builder and
select it from the config, e.g.

    from maskrcnn_tpu.models import registry

    @registry.META_ARCHITECTURES.register("MyDetector")
    class MyDetector: ...
    # cfg.MODEL.META_ARCHITECTURE = "MyDetector"
"""

from ..utils.registry import Registry

META_ARCHITECTURES = Registry()
BACKBONES = Registry()
RPN_HEADS = Registry()
ROI_BOX_FEATURE_EXTRACTORS = Registry()
ROI_BOX_PREDICTOR = Registry()
ROI_MASK_FEATURE_EXTRACTORS = Registry()
ROI_MASK_PREDICTOR = Registry()
ROI_KEYPOINT_FEATURE_EXTRACTORS = Registry()
ROI_KEYPOINT_PREDICTOR = Registry()
