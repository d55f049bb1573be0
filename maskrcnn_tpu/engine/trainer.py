"""Training loop.

Reference: maskrcnn_benchmark/engine/trainer.py:43-184 — iteration loop with
MetricLogger (20-iter cadence, eta, lr, memory), periodic checkpointing,
optional periodic validation. The loss reduction for logging happens on
device inside the jitted step; `reduce_loss_dict` becomes a host read of the
already-psum'd metrics.
"""

import datetime
import math
import os
import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.mesh import shard_batch
from ..utils import comm
from ..utils.metric_logger import MetricLogger
from .train_step import make_train_step


def do_train(
    model,
    tx,
    schedule,
    params,
    opt_state,
    data_loader,
    checkpointer,
    checkpoint_period,
    arguments,
    mesh=None,
    rng=None,
    test_period=0,
    run_validation=None,
):
    logger = logging.getLogger("maskrcnn_tpu.trainer")
    logger.info("Start training")
    meters = MetricLogger(delimiter="  ")
    max_iter = len(data_loader)
    start_iter = arguments["iteration"]
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    train_step = make_train_step(model, tx, mesh)

    # optional device profiling (reference had only wall-clock meters,
    # SURVEY.md §5.1; here a real jax.profiler trace can be captured)
    profile_dir = os.environ.get("MASKRCNN_TPU_PROFILE_DIR")
    profile_at = int(os.environ.get("MASKRCNN_TPU_PROFILE_AT", "50"))

    start_training_time = time.time()
    end = time.time()
    iteration = start_iter
    for batch in data_loader:
        data_time = time.time() - end
        iteration += 1
        arguments["iteration"] = iteration

        # skip degenerate batches (reference trainer.py:74-76) — with padded
        # targets an empty image is fine, but a fully empty batch is not.
        # The decision must be GLOBAL: train_step contains collectives, so
        # one host skipping while others step would desync the psum ordering
        # (hang or cross-step reductions). all_gather the local flag and
        # skip only when every host's shard is empty.
        if "gt_labels" in batch:
            local_has_gt = bool(np.any(batch["gt_labels"] > 0))
            if comm.get_world_size() > 1:
                has_gt = any(comm.all_gather(local_has_gt))
            else:
                has_gt = local_has_gt
            if not has_gt:
                logger.warning(
                    "Iteration={} || batch has no ground truth, skipped".format(
                        iteration
                    )
                )
                end = time.time()
                continue

        step_rng = jax.random.fold_in(rng, iteration)
        device_batch = _to_device(batch, mesh)
        if profile_dir and iteration == profile_at:
            jax.profiler.start_trace(profile_dir)
        params, opt_state, metrics = train_step(
            params, opt_state, device_batch, step_rng
        )
        if profile_dir and iteration == profile_at + 5:
            jax.block_until_ready(metrics["loss"])
            jax.profiler.stop_trace()
            logger.info("profiler trace written to {}".format(profile_dir))

        batch_time = time.time() - end
        end = time.time()
        if iteration % 20 == 0 or iteration == max_iter:
            # reference trainer.py: losses_reduced = reduce_loss_dict(...).
            # Under the mesh the psum already made every host's loss the
            # global one, so this is an (idempotent) average; it only does
            # real work if a setup logs per-host values.
            metrics = comm.reduce_dict({k: float(v) for k, v in metrics.items()})
            if not all(math.isfinite(v) for v in metrics.values()):
                logger.warning(
                    "non-finite loss at iter {}: {} — training has diverged "
                    "(from-scratch runs need unit-variance INPUT.PIXEL_STD "
                    "and a warmup LR; the Caffe2 PIXEL_STD=1 convention "
                    "assumes pretrained conv1 weights)".format(
                        iteration, metrics
                    )
                )
            meters.update(time=batch_time, data=data_time, **metrics)
            eta_seconds = meters.meters["time"].global_avg * (max_iter - iteration)
            eta_string = str(datetime.timedelta(seconds=int(eta_seconds)))
            logger.info(
                meters.delimiter.join(
                    [
                        "eta: {eta}",
                        "iter: {iter}",
                        "{meters}",
                        "lr: {lr:.6f}",
                    ]
                ).format(
                    eta=eta_string,
                    iter=iteration,
                    meters=str(meters),
                    lr=float(schedule(iteration)),
                )
            )
        if iteration % checkpoint_period == 0:
            checkpointer.save(
                "model_{:07d}".format(iteration), params, opt_state, **arguments
            )
        if test_period > 0 and run_validation and iteration % test_period == 0:
            run_validation(params, iteration)
        if iteration >= max_iter:
            break

    checkpointer.save("model_final", params, opt_state, **arguments)
    total_training_time = time.time() - start_training_time
    logger.info(
        "Total training time: {} ({:.4f} s / it)".format(
            str(datetime.timedelta(seconds=int(total_training_time))),
            total_training_time / max(max_iter - start_iter, 1),
        )
    )
    return params, opt_state


def _to_device(batch, mesh):
    arrays = {
        k: v for k, v in batch.items() if isinstance(v, np.ndarray) and k != "indices"
    }
    if mesh is not None:
        out = shard_batch(arrays, mesh)
    else:
        out = jax.tree.map(jnp.asarray, arrays)
    # The SHM loader recycles a batch's slot once the NEXT batch is
    # requested, so the host->device copy must be complete — not merely
    # enqueued — before this loop iteration ends (a still-in-flight DMA
    # reading a recycled slot would silently mix two batches).
    return jax.block_until_ready(out)
