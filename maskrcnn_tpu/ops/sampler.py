"""Balanced positive/negative example sampling with static shapes.

The reference samples a per-image quota of foreground/background examples
via torch.randperm and returns variable-length index lists (reference:
maskrcnn_benchmark/modeling/balanced_positive_negative_sampler.py:5-68).
On TPU that becomes *random-priority top-k with masking*: every candidate
gets a random priority; positives compete for the positive quota, negatives
fill the remainder; outputs are fixed-shape boolean masks (counts vary,
shapes don't), plus an optional fixed-K gather of sampled indices.
"""

import jax
import jax.numpy as jnp

NEG_INF = -1e10


def _top_k(x, k):
    """Exact-value top-k; uses the TPU partition-based approx_max_k (with
    recall 1.0 + final aggregation = exact, sorted values) when the axis is
    large enough to make the full bitonic sort the slower path. Priorities
    here are random floats, so tie-index differences are measure-zero."""
    if x.shape[-1] >= 8192 and k >= 64:
        return jax.lax.approx_max_k(
            x, k, recall_target=1.0, aggregate_to_topk=True
        )
    return jax.lax.top_k(x, k)


def sample_masks(labels, key, batch_size_per_image, positive_fraction):
    """Sample pos/neg masks.

    Args:
      labels: [N] int — 1/positive-class for fg, 0 for bg, -1 ignored.
      key: PRNG key.
      batch_size_per_image: total quota (static).
      positive_fraction: fg share of the quota.

    Returns:
      pos_mask, neg_mask: [N] bool, |pos| <= quota*frac,
      |neg| <= quota - |pos|.
    """
    n = labels.shape[0]
    kp, kn = jax.random.split(key)
    pos = labels >= 1
    neg = labels == 0

    num_pos_quota = int(batch_size_per_image * positive_fraction)

    # "rank < quota" == "priority >= the quota-th largest priority":
    # a k=quota top_k threshold selects the identical set without the full
    # argsort + rank-scatter (which dominated the RPN loss on TPU — scatter
    # of s32[B*N] runs ~0.7 GB/s; top_k over the same data is ~10x cheaper).
    rand_p = jax.random.uniform(kp, (n,))
    pos_priority = jnp.where(pos, rand_p, NEG_INF)
    pos_thr = _top_k(pos_priority, min(num_pos_quota, n))[0][-1]
    pos_mask = pos & (pos_priority >= pos_thr)

    num_pos = jnp.sum(pos_mask)
    num_neg_quota = batch_size_per_image - num_pos  # traced, shapes static

    rand_n = jax.random.uniform(kn, (n,))
    neg_priority = jnp.where(neg, rand_n, NEG_INF)
    k_max = min(batch_size_per_image, n)
    neg_top = _top_k(neg_priority, k_max)[0]
    neg_thr = neg_top[jnp.clip(num_neg_quota - 1, 0, k_max - 1)]
    neg_thr = jnp.where(num_neg_quota > 0, neg_thr, jnp.inf)
    neg_mask = neg & (neg_priority >= neg_thr)
    return pos_mask, neg_mask


def sample_topk_indices(labels, key, batch_size_per_image, positive_fraction):
    """Like sample_masks but also gathers exactly K = batch_size_per_image
    indices (padded with arbitrary indices where invalid).

    Returns (indices [K] int32, valid [K] bool, is_pos [K] bool). Positives
    come first. Used by the ROI box head, which needs a fixed-size ROI batch.
    """
    pos_mask, neg_mask = sample_masks(
        labels, key, batch_size_per_image, positive_fraction
    )
    n = labels.shape[0]
    rand = jax.random.uniform(key, (n,))
    # priority: sampled positives (2, 3), sampled negatives (1, 2), rest -inf
    priority = jnp.where(
        pos_mask, 2.0 + rand, jnp.where(neg_mask, 1.0 + rand, NEG_INF)
    )
    top_p, idx = _top_k(priority, batch_size_per_image)
    valid = top_p > 0
    is_pos = top_p > 2.0
    return idx.astype(jnp.int32), valid, is_pos
