"""Data loader construction.

Reference: maskrcnn_benchmark/data/build.py:18-182. Same pipeline shape —
dataset(s) -> (Distributed)Sampler -> GroupedBatchSampler (aspect ratio)
-> IterationBasedBatchSampler -> multi-process loader with collator
(DATALOADER.NUM_WORKERS worker processes, see loader.DataLoader).

Batch-size semantics match the reference: SOLVER.IMS_PER_BATCH is global;
each host loads global/num_processes images per step (all per-host shards
form the per-step global batch sharded over the mesh).
"""

from ..config.paths_catalog import DatasetCatalog
from ..utils.imports import import_file
from .collate import BatchCollator, BBoxAugCollator
from .loader import DataLoader
from .datasets import (
    CityScapesDataset,
    COCODataset,
    ConcatDataset,
    PascalVOCDataset,
)
from .samplers import (
    BatchSampler,
    DistributedSampler,
    GroupedBatchSampler,
    IterationBasedBatchSampler,
    RandomSampler,
    SequentialSampler,
)
from .transforms import build_transforms

_FACTORIES = {
    "COCODataset": COCODataset,
    "CityScapesDataset": CityScapesDataset,
    "PascalVOCDataset": PascalVOCDataset,
}


def build_dataset(dataset_list, transforms, dataset_catalog, is_train=True):
    if not isinstance(dataset_list, (list, tuple)):
        raise RuntimeError(
            "dataset_list should be a list of strings, got {}".format(dataset_list)
        )
    datasets = []
    for dataset_name in dataset_list:
        data = dataset_catalog.get(dataset_name)
        factory = _FACTORIES[data["factory"]]
        args = dict(data["args"])
        if data["factory"] == "COCODataset":
            args["remove_images_without_annotations"] = is_train
        if data["factory"] == "PascalVOCDataset":
            args["use_difficult"] = not is_train
        args["transforms"] = transforms
        datasets.append(factory(**args))

    if not is_train:
        return datasets
    if len(datasets) > 1:
        return [ConcatDataset(datasets)]
    return datasets


def _compute_aspect_ratio_groups(dataset):
    groups = []
    for i in range(len(dataset)):
        info = dataset.get_img_info(i)
        groups.append(0 if info["width"] >= info["height"] else 1)
    return groups


def make_batch_sampler(
    dataset, sampler, aspect_grouping, images_per_batch, num_iters=None, start_iter=0
):
    if aspect_grouping:
        group_ids = _compute_aspect_ratio_groups(dataset)
        batch_sampler = GroupedBatchSampler(
            sampler, group_ids, images_per_batch, drop_uneven=False
        )
        # GroupedBatchSampler lacks .sampler attr passthrough for set_epoch
        batch_sampler.sampler = sampler
    else:
        batch_sampler = BatchSampler(sampler, images_per_batch, drop_last=False)
    if num_iters is not None:
        batch_sampler = IterationBasedBatchSampler(batch_sampler, num_iters, start_iter)
    return batch_sampler


class _LoaderFactory:
    """Picklable (dataset, collator) builder for spawn-mode loader workers."""

    def __init__(self, cfg, is_train, dataset_index):
        self.cfg = cfg
        self.is_train = is_train
        self.dataset_index = dataset_index

    def __call__(self):
        cfg = self.cfg
        transforms = (
            None
            if not self.is_train and cfg.TEST.BBOX_AUG.ENABLED
            else build_transforms(cfg, self.is_train)
        )
        dataset_list = cfg.DATASETS.TRAIN if self.is_train else cfg.DATASETS.TEST
        datasets = build_dataset(
            dataset_list, transforms, _resolve_catalog(cfg), self.is_train
        )
        if not self.is_train and cfg.TEST.BBOX_AUG.ENABLED:
            collator = BBoxAugCollator()
        else:
            collator = BatchCollator(cfg, is_train=self.is_train)
        return datasets[self.dataset_index], collator


def _slot_bytes(cfg, is_train, batch):
    """SHM slot bound for one collated batch: the largest image bucket plus
    the padded gt fields, with headroom. Sized for the pipeline's nominal
    dtype (uint8 under TPU.DEVICE_NORMALIZE, float32 otherwise); a dataset
    that emits float arrays under DEVICE_NORMALIZE overflows the slot and
    the loader warns once and uses its pickled fallback."""
    from .collate import compute_image_buckets

    buckets = compute_image_buckets(cfg, is_train)
    bh, bw = max(buckets, key=lambda b: b[0] * b[1])
    px = 1 if cfg.TPU.DEVICE_NORMALIZE else 4
    images = batch * bh * bw * 3 * px
    g = cfg.TPU.MAX_GT_BOXES
    gt = batch * g * (4 * 4 + 4)  # boxes f32 + labels i32
    if cfg.MODEL.MASK_ON:
        gt += batch * g * cfg.TPU.GT_MASK_SIZE ** 2  # uint8 patches
    if cfg.MODEL.KEYPOINT_ON:
        gt += batch * g * 17 * 3 * 4
    return images + gt + (1 << 20)


def _resolve_catalog(cfg):
    paths_catalog = cfg.PATHS_CATALOG
    if paths_catalog.endswith("paths_catalog.py") and "maskrcnn_tpu" in paths_catalog:
        return DatasetCatalog
    module = import_file("maskrcnn_tpu.config.paths_catalog_override", paths_catalog)
    return module.DatasetCatalog


def make_data_loader(cfg, is_train=True, is_distributed=False, start_iter=0):
    num_replicas = 1
    rank = 0
    if is_distributed:
        import jax

        num_replicas = jax.process_count()
        rank = jax.process_index()

    if is_train:
        images_per_batch = cfg.SOLVER.IMS_PER_BATCH
        assert images_per_batch % num_replicas == 0
        images_per_host = images_per_batch // num_replicas
        shuffle = True
        num_iters = cfg.SOLVER.MAX_ITER
    else:
        images_per_batch = cfg.TEST.IMS_PER_BATCH
        assert images_per_batch % num_replicas == 0
        images_per_host = images_per_batch // num_replicas
        shuffle = False
        num_iters = None
        start_iter = 0

    aspect_grouping = cfg.DATALOADER.ASPECT_RATIO_GROUPING

    catalog = _resolve_catalog(cfg)

    transforms = (
        None if not is_train and cfg.TEST.BBOX_AUG.ENABLED else build_transforms(cfg, is_train)
    )
    dataset_list = cfg.DATASETS.TRAIN if is_train else cfg.DATASETS.TEST
    datasets = build_dataset(dataset_list, transforms, catalog, is_train)

    loaders = []
    for di, dataset in enumerate(datasets):
        if is_distributed:
            sampler = DistributedSampler(dataset, num_replicas, rank, shuffle=shuffle)
        elif shuffle:
            sampler = RandomSampler(dataset)
        else:
            sampler = SequentialSampler(dataset)
        batch_sampler = make_batch_sampler(
            dataset, sampler, aspect_grouping and is_train, images_per_host,
            num_iters, start_iter,
        )
        if not is_train and cfg.TEST.BBOX_AUG.ENABLED:
            collator = BBoxAugCollator()
        else:
            collator = BatchCollator(cfg, is_train=is_train)
        loaders.append(
            DataLoader(
                dataset, batch_sampler, collator, cfg.DATALOADER.NUM_WORKERS,
                factory=_LoaderFactory(cfg, is_train, di),
                slot_bytes=_slot_bytes(cfg, is_train, images_per_host),
            )
        )
    if is_train:
        assert len(loaders) == 1
        return loaders[0]
    return loaders
