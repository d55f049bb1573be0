"""maskrcnn_tpu: a TPU-native object detection / instance segmentation stack.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
facebookresearch/maskrcnn-benchmark: Faster/Mask/Keypoint R-CNN, RetinaNet and
RPN-only models over ResNet/ResNeXt(+FPN) backbones, COCO/VOC training and
evaluation, data-parallel training over a `jax.sharding.Mesh`.

Design pillars (vs. the CUDA/torch reference):
  * everything inside `jit` uses static, padded shapes + validity masks; the
    dynamic-shape BoxList lives only at the host/API boundary
  * NMS / ROIAlign / focal loss are Pallas TPU kernels (with jnp references)
  * data parallelism = shard_map/pjit over an ICI mesh with psum, not DDP
"""

__version__ = "0.1.0"
