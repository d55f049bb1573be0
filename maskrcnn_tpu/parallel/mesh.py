"""Device mesh + sharding helpers (the NCCL/DDP replacement).

The reference's distributed story is one-process-per-GPU NCCL DDP
(reference: tools/train_net.py:49-54, utils/comm.py). Here data parallelism
is a `jax.sharding.Mesh` over all devices with the batch sharded on the
"data" axis and parameters/optimizer state replicated; jit's sharding
propagation inserts the gradient all-reduce (psum) over ICI automatically.
Multi-host TPU slices work through the same mesh via
`jax.distributed.initialize` (utils/comm.py handles process-level setup).

The mesh shape is configurable (cfg.TPU.MESH_AXES/MESH_SHAPE) so future
model-parallel axes slot in without touching the train step.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(cfg=None, devices=None):
    devices = devices if devices is not None else jax.devices()
    if cfg is None:
        axes, shape = ("data",), (-1,)
    else:
        axes = tuple(cfg.TPU.MESH_AXES)
        shape = tuple(cfg.TPU.MESH_SHAPE)
    shape = list(shape)
    n = len(devices)
    fixed = 1
    for s in shape:
        if s != -1:
            fixed *= s
    for i, s in enumerate(shape):
        if s == -1:
            shape[i] = n // fixed
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axes)


def data_sharding(mesh):
    """Sharding for batch leaves: leading dim split over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh):
    """Place a host batch dict onto the mesh, batch dim over 'data'."""
    s = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(tree, mesh):
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)


def tree_shardings(tree, mesh):
    """Per-leaf NamedSharding for a parameter/optimizer tree.

    Data-only mesh (the default): everything replicated — plain data
    parallelism. When the mesh carries a "model" axis of size > 1, every
    rank>=2 leaf whose LAST dim divides the axis is sharded on it
    (output-channel tensor parallelism: fc [in, out] and conv HWIO [.., out]
    both split the output dim, the Megatron column layout); 1-D leaves
    (biases, BN scales) and indivisible shapes stay replicated and XLA's
    sharding propagation inserts the collectives where layouts meet.
    """
    if "model" not in mesh.axis_names or mesh.shape["model"] == 1:
        r = replicated(mesh)
        return jax.tree.map(lambda _: r, tree)
    mp = mesh.shape["model"]

    def leaf(x):
        shape = getattr(x, "shape", ())
        if len(shape) >= 2 and shape[-1] % mp == 0 and shape[-1] >= mp:
            spec = P(*([None] * (len(shape) - 1) + ["model"]))
            return NamedSharding(mesh, spec)
        return replicated(mesh)

    return jax.tree.map(leaf, tree)


def shard_params(tree, mesh):
    """Place a parameter/optimizer tree onto the mesh per tree_shardings
    (== replicate() on a data-only mesh)."""
    shardings = tree_shardings(tree, mesh)
    return jax.tree.map(jax.device_put, tree, shardings)
