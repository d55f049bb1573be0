"""Worker script for the 2-process jax.distributed CPU test.

Run as: python distributed_worker.py <rank> <world> <port> <outdir>
Covers, in one process pair: comm.all_gather / reduce_dict / synchronize,
DistributedSampler shard disjointness+coverage, a 2-device global-mesh
train step with replicated-parameter agreement across ranks, the
inference-style prediction merge, and rank-0-only checkpoint writing.
Prints WORKER_OK <rank> on success (asserted by tests/test_distributed.py).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))


def main():
    rank, world = int(sys.argv[1]), int(sys.argv[2])
    port, outdir = sys.argv[3], sys.argv[4]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        "localhost:{}".format(port), num_processes=world, process_id=rank
    )
    assert jax.process_count() == world
    assert len(jax.devices()) == world  # one CPU device per process

    import numpy as np

    from maskrcnn_tpu.utils import comm

    # --- pickled all_gather (ragged payloads) + reduce_dict + barrier ---
    gathered = comm.all_gather({"rank": rank, "blob": "x" * (10 + rank * 997)})
    assert [g["rank"] for g in gathered] == list(range(world))
    assert len(gathered[1]["blob"]) == 10 + 997

    rd = comm.reduce_dict({"loss": float(rank)})
    assert abs(rd["loss"] - (world - 1) / 2.0) < 1e-6, rd
    rs = comm.reduce_dict({"loss": float(rank)}, average=False)
    assert abs(rs["loss"] - sum(range(world))) < 1e-6, rs
    comm.synchronize()

    # --- DistributedSampler: shards are disjoint and cover the dataset ---
    from maskrcnn_tpu.data.samplers import DistributedSampler

    class _Sized:
        def __len__(self):
            return 11  # odd on purpose: exercises padding

        dataset = None

    sampler = DistributedSampler(_Sized(), world, rank, shuffle=True)
    sampler.set_epoch(3)
    mine = list(iter(sampler))
    shards = comm.all_gather(mine)
    assert len({len(s) for s in shards}) == 1  # equal shard sizes
    union = set(i for s in shards for i in s)
    assert union == set(range(11)), union

    # --- 3 train steps over the 2-device global mesh ---
    from __graft_entry__ import _flagship_cfg
    from maskrcnn_tpu.engine.train_step import make_train_step
    from maskrcnn_tpu.models import build_detection_model
    from maskrcnn_tpu.parallel.mesh import create_mesh, replicate, shard_batch
    from maskrcnn_tpu.solver import make_optimizer

    c = _flagship_cfg(tiny=True)
    c.MODEL.MASK_ON = False  # keep the CPU compile small
    c.freeze()
    model = build_detection_model(c)
    mesh = create_mesh(devices=jax.devices())
    params = model.init(jax.random.PRNGKey(0))
    tx, _ = make_optimizer(c, params, model.frozen_mask(params))
    opt_state = tx.init(params)
    params = replicate(params, mesh)
    opt_state = replicate(opt_state, mesh)

    b, h, w, g = world, 64, 64, 4
    rng_np = np.random.RandomState(0)  # same data on every host
    gt_boxes = np.zeros((b, g, 4), np.float32)
    gt_boxes[:, 0] = [8, 8, 40, 40]
    gt_labels = np.zeros((b, g), np.int32)
    gt_labels[:, 0] = 1
    batch = dict(
        images=rng_np.randn(b, h, w, 3).astype(np.float32),
        image_sizes=np.asarray([[h, w]] * b, np.int32),
        gt_boxes=gt_boxes,
        gt_labels=gt_labels,
    )
    batch = shard_batch(batch, mesh)

    step = make_train_step(model, tx, mesh=mesh)
    rng = jax.random.PRNGKey(1)
    for i in range(3):
        params, opt_state, metrics = step(
            params, opt_state, batch, jax.random.fold_in(rng, i)
        )
    loss = float(metrics["loss"])
    assert np.isfinite(loss), loss

    # replicated params must be bit-identical across ranks
    leaf = np.asarray(jax.tree.leaves(params)[0]).ravel()[:8]
    leaves = comm.all_gather(leaf.tolist())
    assert leaves[0] == leaves[rank], "params diverged across ranks"
    losses = comm.all_gather(loss)
    assert losses[0] == losses[1]

    # --- inference-style merged prediction set ---
    local_preds = {i: "pred{}".format(i) for i in mine}
    merged = {}
    for part in comm.all_gather(local_preds):
        merged.update(part)
    assert set(merged) == set(range(11))

    # --- real data loader under distribution: SHM worker processes +
    # uneven shards (7 images across `world` ranks) ---
    from synthetic_coco import make_synthetic_coco

    data_dir = os.path.join(outdir, "data")
    if comm.is_main_process():
        make_synthetic_coco(data_dir, num_images=7, num_classes=2)
    comm.synchronize()
    from maskrcnn_tpu.config import cfg as cfg_root
    from maskrcnn_tpu.config.paths_catalog import DatasetCatalog
    from maskrcnn_tpu.data.build import make_data_loader

    lc = cfg_root.clone()
    lc.DATASETS.TRAIN = ("coco_2017_train",)
    lc.SOLVER.IMS_PER_BATCH = world
    lc.SOLVER.MAX_ITER = 2
    lc.DATALOADER.NUM_WORKERS = 1
    lc.INPUT.MIN_SIZE_TRAIN = (64,)
    lc.INPUT.MAX_SIZE_TRAIN = 96
    lc.TPU.MAX_GT_BOXES = 8
    old_dir = DatasetCatalog.DATA_DIR
    DatasetCatalog.DATA_DIR = data_dir
    DatasetCatalog._COCO_SETS = dict(
        DatasetCatalog._COCO_SETS,
        coco_2017_train=("images", "instances.json"),
    )
    lc.freeze()
    loader = make_data_loader(lc, is_train=True, is_distributed=True)
    it = iter(loader)
    lb = next(it)
    assert lb["images"].shape[0] == 1  # world imgs / world ranks
    assert lb["images"].dtype.kind in "uf"
    comm.synchronize()
    del it, loader
    DatasetCatalog.DATA_DIR = old_dir

    # --- rank-0-only checkpoint write ---
    from maskrcnn_tpu.utils.checkpoint import Checkpointer

    ckpt = Checkpointer(
        save_dir=outdir, save_to_disk=comm.is_main_process()
    )
    ckpt.save("dist_test", params)
    comm.synchronize()
    exists = os.path.exists(os.path.join(outdir, "dist_test.npz"))
    assert exists == True  # rank 0 wrote it; rank 1 sees the shared fs
    print("WORKER_OK", rank, flush=True)


if __name__ == "__main__":
    main()
