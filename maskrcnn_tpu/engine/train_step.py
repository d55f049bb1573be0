"""The jitted data-parallel train step.

One compiled program = forward + backward + psum(grads over ICI) + SGD
update. Parameters/optimizer state are replicated over the mesh, the batch
is sharded on the "data" axis; jit's sharding propagation inserts the
collectives (the DDP allreduce of reference tools/train_net.py:49-54).
"""

import jax

from ..parallel.mesh import data_sharding, replicated


def make_train_step(model, tx, mesh=None, donate=True):
    """Returns train_step(params, opt_state, batch, rng) ->
    (params, opt_state, metrics)."""

    def step(params, opt_state, batch, rng):
        def loss_fn(p):
            losses = model.train_forward(p, batch, rng)
            total = sum(jax.tree.leaves(losses))
            return total, losses

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        with jax.named_scope("optimizer"):
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree.map(
                lambda p, u: (p + u.astype(p.dtype)) if u is not None else p,
                params,
                updates,
                is_leaf=lambda x: x is None,
            )
        metrics = dict(losses)
        metrics["loss"] = total
        return params, opt_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1) if donate else ())

    if "model" in mesh.axis_names and mesh.shape["model"] > 1:
        # hybrid dp x tp: params/opt-state arrive pre-sharded per
        # parallel.mesh.shard_params (output-channel tensor parallelism);
        # jit infers shardings from the committed inputs and XLA places the
        # collectives (psum over 'data' for grads, all-gathers/reduce-
        # scatters over 'model' where layouts meet)
        return jax.jit(step, donate_argnums=(0, 1) if donate else ())

    rep = replicated(mesh)
    dat = data_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(rep, rep, dat, rep),
        out_shardings=(rep, rep, rep),
        donate_argnums=(0, 1) if donate else (),
    )


def make_eval_step(model, mesh=None):
    def step(params, batch):
        return model.infer_forward(params, batch)

    if mesh is None:
        return jax.jit(step)
    rep = replicated(mesh)
    dat = data_sharding(mesh)
    return jax.jit(step, in_shardings=(rep, dat), out_shardings=dat)
