"""Multi-host communication primitives.

Reference: maskrcnn_benchmark/utils/comm.py — NCCL collectives for rank
bookkeeping, pickled all_gather, loss-dict reduce, barrier. The JAX
equivalents: process_index/process_count for rank info, and
multihost_utils for cross-host gathers/barriers. Within a host, jit's mesh
handles everything; these functions exist for host-level orchestration
(eval result gathering, rank-0 checkpoint writes, barriers).
"""

import pickle

import jax
import numpy as np


def get_world_size():
    return jax.process_count()


def get_rank():
    return jax.process_index()


def is_main_process():
    return get_rank() == 0


def synchronize():
    """Barrier across hosts (no-op single host)."""
    if get_world_size() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("maskrcnn_tpu.sync")


def all_gather(data):
    """All-gather arbitrary picklable data across hosts -> list per rank.
    (reference comm.py:48-88 did this with padded ByteTensors over NCCL)."""
    world_size = get_world_size()
    if world_size == 1:
        return [data]
    from jax.experimental import multihost_utils

    buf = np.frombuffer(pickle.dumps(data), dtype=np.uint8)
    local_size = np.asarray([buf.size], np.int64)
    sizes = multihost_utils.process_allgather(local_size).reshape(-1)
    max_size = int(sizes.max())
    padded = np.zeros(max_size, np.uint8)
    padded[: buf.size] = buf
    gathered = multihost_utils.process_allgather(padded)
    out = []
    for rank in range(world_size):
        out.append(pickle.loads(gathered[rank, : int(sizes[rank])].tobytes()))
    return out


def reduce_dict(input_dict, average=True):
    """Average scalar dict across hosts for logging (comm.py:91-117).
    Under the mesh the loss is already identical on all hosts, so this is a
    passthrough single-host and a mean otherwise."""
    world_size = get_world_size()
    if world_size < 2:
        return {k: float(v) for k, v in input_dict.items()}
    gathered = all_gather({k: float(v) for k, v in input_dict.items()})
    keys = gathered[0].keys()
    out = {}
    for k in keys:
        vals = [g[k] for g in gathered]
        out[k] = sum(vals) / len(vals) if average else sum(vals)
    return out
