"""Anchor/proposal-to-ground-truth matching.

Functional, fixed-shape re-design of the reference Matcher
(reference: maskrcnn_benchmark/modeling/matcher.py:5-111). Works on a padded
IoU matrix with a gt-validity mask instead of a dynamically sized one.

Outputs per anchor: index of the matched gt (argmax over *valid* gt rows) or
the sentinel labels BELOW_LOW_QUALITY (-1) / BETWEEN_THRESHOLDS (-2) encoded
exactly as in the reference so downstream label logic is identical.
"""

import jax.numpy as jnp

BELOW_LOW_QUALITY = -1
BETWEEN_THRESHOLDS = -2


def match_proposals(
    iou,  # [G, N] pairwise IoU (gt x anchors), padded gt rows arbitrary
    gt_valid,  # [G] bool
    high_threshold,
    low_threshold,
    allow_low_quality_matches=False,
):
    """Returns matches [N] int32: >=0 gt index, -1 below-low, -2 between."""
    iou = jnp.where(gt_valid[:, None], iou, -1.0)
    matched_vals = jnp.max(iou, axis=0)  # [N]
    matches = jnp.argmax(iou, axis=0).astype(jnp.int32)  # [N]

    below = matched_vals < low_threshold
    between = (matched_vals >= low_threshold) & (matched_vals < high_threshold)
    out = jnp.where(below, BELOW_LOW_QUALITY, matches)
    out = jnp.where(between, BETWEEN_THRESHOLDS, out)

    if allow_low_quality_matches:
        # For each valid gt, anchors achieving that gt's best IoU keep their
        # argmax match even if below threshold (reference matcher.py:85-111).
        highest_per_gt = jnp.max(iou, axis=1, keepdims=True)  # [G, 1]
        is_best = (iou == highest_per_gt) & gt_valid[:, None] & (highest_per_gt > 0)
        update = jnp.any(is_best, axis=0)  # [N]
        out = jnp.where(update, matches, out)
    return out
