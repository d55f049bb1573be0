"""Anchor/proposal-to-ground-truth matching.

Functional, fixed-shape re-design of the reference Matcher
(reference: maskrcnn_benchmark/modeling/matcher.py:5-111). Works on a padded
IoU matrix with a gt-validity mask instead of a dynamically sized one.

Outputs per anchor: index of the matched gt (argmax over *valid* gt rows) or
the sentinel labels BELOW_LOW_QUALITY (-1) / BETWEEN_THRESHOLDS (-2) encoded
exactly as in the reference so downstream label logic is identical.
"""

import jax.numpy as jnp
from jax import lax

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


def match_anchors_streaming(
    anchors,  # [N, 4] (N large, e.g. ~270k RPN anchors)
    gt_boxes,  # [G, 4]
    gt_valid,  # [G] bool
    high_threshold,
    low_threshold,
    chunk=None,
):
    """match_proposals(box_iou(gt, anchors), ..., allow_low_quality=True)
    without ever materializing the [G, N] IoU table.

    At RPN scale the table is ~100 MB/image and the XLA graph reads it five
    times (max, argmax, two compares, any) — ~13 ms/step at batch 8. Here
    anchors stream through a lax.scan in fixed chunks; each iteration fuses
    the IoU math with its reductions in VMEM, so HBM traffic drops to the
    anchor array plus [N]-sized outputs and a bit-mask.

    One pass only. Each chunk records (a) per-anchor best value/index over
    gt, (b) this chunk's per-gt maximum, and (c) the per-(gt, anchor) tie
    mask `iou == chunk_max` — an equality between a tensor and its own
    reduction inside one fusion, which is deterministic. After the scan the
    low-quality restore is decided purely on STORED values (chunk max ==
    global max), never by recomputing IoU, so no FMA/fusion variance between
    passes can break tie detection (recomputing IoU in a second scan
    measurably rounds differently under XLA:CPU).

    Semantics match match_proposals(..., allow_low_quality_matches=True)
    bit-for-bit; tested against it in tests/test_ops.py.
    """
    from .box_ops import box_iou

    if chunk is None:
        # 16384 measures ~2x faster than 4096 on v5e (17 vs 66 scan
        # iterations amortize the per-step latency); the virtual-CPU mesh
        # tests keep the smaller chunk — [G, 16384] f32 per device blows
        # past the CPU backend's comfortable working set
        import jax

        chunk = 16384 if jax.default_backend() == "tpu" else 4096

    n = anchors.shape[0]
    pad = (-n) % chunk
    anc = jnp.pad(anchors, ((0, pad), (0, 0)))
    # padded anchor rows ([0,0,0,0] = a 1x1 box at the origin under the +1
    # convention) must not enter the per-gt best-IoU reduction, or they can
    # steal a gt's best match from a real anchor
    col_valid = (jnp.arange(n + pad) < n).reshape(-1, chunk)
    anc = anc.reshape(-1, chunk, 4)

    # (A dynamic while_loop over gt blocks — running only ceil(valid/GB)
    # blocks instead of the static G cap — was tried and measured SLOWER
    # at batch 8 on v5e: the vmapped while's per-iteration carry selects
    # and scatter-shaped tie updates cost more than the masked rows of one
    # fused [G, chunk] pass. The static single-fusion body stays.)
    def body(_, xs):
        anc_c, cv = xs
        iou = box_iou(gt_boxes, anc_c)  # [G, chunk]
        iou = jnp.where(gt_valid[:, None], iou, -1.0)
        mv = jnp.max(iou, axis=0)  # [chunk]
        mi = jnp.argmax(iou, axis=0).astype(jnp.int32)
        mc = jnp.max(jnp.where(cv[None, :], iou, -1.0), axis=1)  # [G]
        tie = (iou == mc[:, None]) & gt_valid[:, None]  # [G, chunk]
        return None, (mv, mi, mc, tie)

    _, (mvs, mis, mcs, ties) = lax.scan(body, None, (anc, col_valid))
    matched_vals = mvs.reshape(-1)[:n]
    matches = mis.reshape(-1)[:n]

    best_gt = jnp.max(mcs, axis=0)  # [G]
    # chunks whose stored per-gt max IS the global max hold that gt's
    # best-matching anchors; their stored tie rows mark which ones
    chunk_has_best = (mcs == best_gt[None, :]) & (best_gt[None, :] > 0)
    update = jnp.any(ties & chunk_has_best[:, :, None], axis=1)  # [nc, chunk]
    update = update.reshape(-1)[:n]

    below = matched_vals < low_threshold
    between = (matched_vals >= low_threshold) & (matched_vals < high_threshold)
    out = jnp.where(below, BELOW_LOW_QUALITY, matches)
    out = jnp.where(between, BETWEEN_THRESHOLDS, out)
    return jnp.where(update, matches, out)


def match_anchors_batched(
    anchors,  # [N, 4] (shared across images)
    gt_boxes,  # [B, G, 4]
    gt_valid,  # [B, G] bool
    high_threshold,
    low_threshold,
):
    """Batched allow_low_quality anchor matcher: [B, N] s32.

    Dispatches to the fused Pallas kernel on TPU (VMEM-resident anchors,
    gt loop bounded by the actual per-image gt count — see
    ops/pallas/matcher_kernel.py) and to vmapped match_anchors_streaming
    elsewhere. Same contract as the reference Matcher with
    allow_low_quality_matches=True (matcher.py:49-111)."""
    from .nms import _use_pallas

    if _use_pallas():
        from .pallas.matcher_kernel import match_anchors_pallas

        return match_anchors_pallas(
            anchors, gt_boxes, gt_valid, high_threshold, low_threshold
        )
    import jax

    return jax.vmap(
        lambda gb, gv: match_anchors_streaming(
            anchors, gb, gv, high_threshold, low_threshold
        )
    )(gt_boxes, gt_valid)
