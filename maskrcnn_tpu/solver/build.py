"""Optimizer + LR schedule (optax).

Reference: maskrcnn_benchmark/solver/build.py:7-20 (SGD with per-parameter
groups: biases get BIAS_LR_FACTOR x LR and WEIGHT_DECAY_BIAS) and
solver/lr_scheduler.py:10-52 (WarmupMultiStepLR: linear/constant warmup then
x GAMMA at each milestone).

The torch "parameter groups" become optax masks over the param pytree:
  * bias mask — leaves named "b" or frozen-BN/GN "bias"
  * frozen mask from the model (frozen stages + BN buffers) — those leaves
    get zero updates (they're also stop_gradient'ed in the forward)

SGD update order matches torch: grad += wd * param (coupled weight decay),
then momentum buffer v = mu*v + grad, param -= lr * v.
"""

import jax
import jax.numpy as jnp
import optax


def warmup_multistep_schedule(cfg):
    base_lr = cfg.SOLVER.BASE_LR
    steps = tuple(cfg.SOLVER.STEPS)
    gamma = cfg.SOLVER.GAMMA
    warmup_iters = cfg.SOLVER.WARMUP_ITERS
    warmup_factor = cfg.SOLVER.WARMUP_FACTOR
    method = cfg.SOLVER.WARMUP_METHOD

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        if method == "linear":
            alpha = count / max(warmup_iters, 1)
            wf = warmup_factor * (1 - alpha) + alpha
        else:  # constant
            wf = jnp.asarray(warmup_factor, jnp.float32)
        factor = jnp.where(count < warmup_iters, wf, 1.0)
        decay = jnp.ones((), jnp.float32)
        for s in steps:
            decay = decay * jnp.where(count >= s, gamma, 1.0)
        return base_lr * factor * decay

    return schedule


def _is_bias_path(path):
    last = path[-1]
    key = getattr(last, "key", getattr(last, "idx", None))
    return key in ("b", "bias")


def make_bias_mask(params):
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _is_bias_path(path), params
    )


def make_optimizer(cfg, params, frozen_mask=None):
    """Returns (optax.GradientTransformation, schedule_fn).

    The returned transformation consumes raw grads and produces updates to
    be applied with optax.apply_updates (updates already include -lr)."""
    schedule = warmup_multistep_schedule(cfg)
    bias_mask = make_bias_mask(params)

    wd = cfg.SOLVER.WEIGHT_DECAY
    wd_bias = cfg.SOLVER.WEIGHT_DECAY_BIAS
    bias_lr_factor = cfg.SOLVER.BIAS_LR_FACTOR
    momentum = cfg.SOLVER.MOMENTUM

    chain = [
        # coupled weight decay, per-group
        optax.masked(
            optax.add_decayed_weights(wd),
            jax.tree.map(lambda b: not b, bias_mask),
        ),
        optax.masked(optax.add_decayed_weights(wd_bias), bias_mask),
        optax.trace(decay=momentum, nesterov=False),
        optax.scale_by_learning_rate(schedule),  # multiplies by -lr(count)
        # bias LR factor
        optax.masked(
            optax.scale(float(bias_lr_factor)), bias_mask
        ),
    ]
    tx = optax.chain(*chain)
    if frozen_mask is not None:
        # masked() passes un-masked leaves through UNCHANGED (raw grads), so
        # frozen leaves (incl. BN buffers, which do receive gradients) must
        # be explicitly zeroed, not just excluded from the main chain.
        not_frozen = jax.tree.map(lambda f: not f, frozen_mask)
        tx = optax.chain(
            optax.masked(optax.set_to_zero(), frozen_mask),
            optax.masked(tx, not_frozen),
        )
    return tx, schedule
