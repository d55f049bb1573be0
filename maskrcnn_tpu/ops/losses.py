"""Loss functions: smooth-L1, sigmoid focal loss, masked cross-entropy/BCE.

Pure jnp with masking — XLA's autodiff supplies backward passes, and fusion
makes separate backward kernels unnecessary (the reference needed CUDA
forward+backward kernels for focal loss: csrc/cuda/SigmoidFocalLoss_cuda.cu).

Semantics:
  * smooth_l1_loss — beta-parameterized Huber
    (reference: maskrcnn_benchmark/layers/smooth_l1_loss.py:6-15)
  * sigmoid_focal_loss — per-(anchor, class) focal terms; `targets` uses
    class ids 1..C (0 = background, negatives ignored), logits have C
    channels for classes 1..C
    (reference: maskrcnn_benchmark/layers/sigmoid_focal_loss.py:40-50)
"""

import jax
import jax.numpy as jnp


def smooth_l1_loss(input, target, beta=1.0 / 9):
    """Elementwise smooth-L1. Reduction is the caller's job (the reference's
    size_average/sum flags become explicit masked sums)."""
    n = jnp.abs(input - target)
    return jnp.where(n < beta, 0.5 * n * n / beta, n - 0.5 * beta)


def sigmoid_focal_loss(logits, targets, gamma=2.0, alpha=0.25):
    """Focal loss.

    Args:
      logits: [N, C] raw scores for classes 1..C.
      targets: [N] int — 0 background, 1..C class id, -1 ignore.

    Returns [N, C] elementwise losses (caller sums/normalizes).
    """
    c = logits.shape[-1]
    class_range = jnp.arange(1, c + 1, dtype=targets.dtype)  # [C]
    t = targets[..., None]  # [N, 1]
    p = jax.nn.sigmoid(logits)
    # log(p) = -softplus(-x), log(1-p) = -softplus(x): numerically stable.
    log_p = -jax.nn.softplus(-logits)
    log_1mp = -jax.nn.softplus(logits)
    term_pos = ((1.0 - p) ** gamma) * log_p
    term_neg = (p ** gamma) * log_1mp
    is_pos = (t == class_range).astype(logits.dtype)
    is_neg = ((t != class_range) & (t >= 0)).astype(logits.dtype)
    return -is_pos * term_pos * alpha - is_neg * term_neg * (1.0 - alpha)


def softmax_cross_entropy(logits, labels, mask=None):
    """Mean CE over masked elements. logits [N, C], labels [N] int."""
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    safe_labels = jnp.clip(labels, 0, logits.shape[-1] - 1)
    nll = -jnp.take_along_axis(log_probs, safe_labels[..., None], axis=-1)[..., 0]
    if mask is None:
        return jnp.mean(nll)
    mask = mask.astype(logits.dtype)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def binary_cross_entropy_with_logits(logits, targets):
    """Elementwise BCE with logits (stable)."""
    return jax.nn.softplus(logits) - logits * targets
