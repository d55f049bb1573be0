import numpy as np
import pytest

from maskrcnn_tpu.data.samplers import (
    BatchSampler,
    DistributedSampler,
    GroupedBatchSampler,
    IterationBasedBatchSampler,
    RandomSampler,
    SequentialSampler,
)
from maskrcnn_tpu.solver import warmup_multistep_schedule
from maskrcnn_tpu.utils.metric_logger import MetricLogger, SmoothedValue


class FakeDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n


def test_distributed_sampler_partitions():
    ds = FakeDataset(10)
    all_idx = []
    for rank in range(3):
        s = DistributedSampler(ds, num_replicas=3, rank=rank, shuffle=False)
        idx = list(s)
        assert len(idx) == 4  # ceil(10/3) with padding
        all_idx.extend(idx)
    assert set(all_idx) == set(range(10))


def test_distributed_sampler_epoch_shuffle():
    ds = FakeDataset(20)
    s = DistributedSampler(ds, 1, 0, shuffle=True)
    s.set_epoch(0)
    a = list(s)
    s.set_epoch(1)
    b = list(s)
    assert a != b and sorted(a) == sorted(b)


def test_grouped_batch_sampler_groups():
    ds = FakeDataset(10)
    group_ids = [0, 1, 0, 1, 0, 1, 0, 1, 0, 1]
    sampler = SequentialSampler(ds)
    gbs = GroupedBatchSampler(sampler, group_ids, batch_size=2)
    batches = list(gbs)
    for b in batches:
        gs = {group_ids[i] for i in b}
        assert len(gs) == 1  # batches never mix groups
    flat = sorted(i for b in batches for i in b)
    assert flat == list(range(10))


def test_iteration_based_sampler_length_and_resume():
    ds = FakeDataset(6)
    bs = BatchSampler(RandomSampler(ds), 2, drop_last=False)
    it = IterationBasedBatchSampler(bs, num_iterations=10, start_iter=0)
    batches = list(it)
    assert len(batches) == 10
    it2 = IterationBasedBatchSampler(bs, num_iterations=10, start_iter=7)
    assert len(list(it2)) == 3


def test_smoothed_value_and_logger():
    v = SmoothedValue(window_size=3)
    for x in [1, 2, 3, 4]:
        v.update(x)
    assert v.median == 3
    assert v.global_avg == 2.5
    ml = MetricLogger()
    ml.update(loss=1.0, acc=0.5)
    assert "loss" in str(ml)


def test_warmup_multistep_schedule():
    from maskrcnn_tpu.config import cfg

    c = cfg.clone()
    c.SOLVER.BASE_LR = 0.02
    c.SOLVER.WARMUP_ITERS = 500
    c.SOLVER.WARMUP_FACTOR = 1.0 / 3
    c.SOLVER.STEPS = (60000, 80000)
    c.SOLVER.GAMMA = 0.1
    sched = warmup_multistep_schedule(c)
    assert abs(float(sched(0)) - 0.02 / 3) < 1e-6
    assert abs(float(sched(500)) - 0.02) < 1e-6
    assert abs(float(sched(250)) - 0.02 * (1 / 3 + (1 - 1 / 3) * 0.5)) < 1e-6
    assert abs(float(sched(70000)) - 0.002) < 1e-7
    assert abs(float(sched(85000)) - 0.0002) < 1e-8


class _ArrayDataset:
    """Deterministic arrays so worker-path output can be diffed vs inline."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rs = np.random.RandomState(i)
        return rs.randint(0, 255, (4, 6, 3), np.uint8), i


def _collate_arrays(items):
    return {
        "images": np.stack([im for im, _ in items]),
        "indices": np.asarray([i for _, i in items], np.int64),
    }


def test_worker_loader_matches_inline():
    # the SHM worker transport must reproduce the inline stream exactly
    from maskrcnn_tpu.data.loader import DataLoader

    ds = _ArrayDataset(13)
    batches = [[0, 1, 2], [3, 4], [5, 6, 7], [8], [9, 10, 11, 12]]
    inline = list(
        DataLoader(ds, batches, _collate_arrays, num_workers=0)
    )
    # SHM batches are zero-copy views valid until the next __next__, so a
    # consumer that retains them must copy (the train loop's device
    # transfer IS that copy)
    workers = [
        {k: np.copy(v) for k, v in b.items()}
        for b in DataLoader(
            ds, batches, _collate_arrays, num_workers=2, slot_bytes=1 << 20
        )
    ]
    assert len(inline) == len(workers) == len(batches)
    for a, b in zip(inline, workers):
        np.testing.assert_array_equal(a["images"], b["images"])
        np.testing.assert_array_equal(a["indices"], b["indices"])


def test_worker_loader_slot_overflow_fallback():
    # a batch larger than the SHM slot must arrive via the pickled fallback
    from maskrcnn_tpu.data.loader import DataLoader

    ds = _ArrayDataset(4)
    batches = [[0, 1], [2, 3]]
    out = list(
        DataLoader(ds, batches, _collate_arrays, num_workers=1, slot_bytes=16)
    )
    inline = list(DataLoader(ds, batches, _collate_arrays, num_workers=0))
    for a, b in zip(inline, out):
        np.testing.assert_array_equal(a["images"], b["images"])


def test_worker_loader_surfaces_errors():
    from maskrcnn_tpu.data.loader import DataLoader

    class Bad(_ArrayDataset):
        def __getitem__(self, i):
            if i == 3:
                raise ValueError("boom")
            return super().__getitem__(i)

    with pytest.raises(RuntimeError, match="boom"):
        list(DataLoader(Bad(5), [[0, 1], [2, 3]], _collate_arrays, num_workers=1))


def test_worker_loader_single_slot_config_yields_all_batches():
    # num_workers=1, prefetch_per_worker=1 used to truncate the stream to one
    # batch (held-slot protocol starvation); the loader must floor at 2 slots
    from maskrcnn_tpu.data.loader import DataLoader

    ds = _ArrayDataset(8)
    batches = [[0, 1], [2, 3], [4, 5], [6, 7]]
    got = [
        {k: np.copy(v) for k, v in b.items()}
        for b in DataLoader(
            ds, batches, _collate_arrays, num_workers=1,
            prefetch_per_worker=1, slot_bytes=1 << 20,
        )
    ]
    assert len(got) == 4
    np.testing.assert_array_equal(
        np.concatenate([b["indices"] for b in got]), np.arange(8)
    )


def test_normalize_uint8_passthrough_still_normalizes_float():
    # DEVICE_NORMALIZE defers uint8 to the device but float inputs (ToArray
    # passthrough of synthetic arrays) must still be normalized on host
    from maskrcnn_tpu.data.transforms import Normalize

    mean, std = [102.98, 115.95, 122.77], [1.0, 1.0, 1.0]
    n = Normalize(mean, std, to_bgr255=True, uint8_passthrough=True)
    u8 = np.full((4, 4, 3), 100, np.uint8)
    out, _ = n(u8, None)
    assert out.dtype == np.uint8 and out is u8
    f32 = np.full((4, 4, 3), 100.0, np.float32)
    out, _ = n(f32, None)
    assert out.dtype == np.float32
    np.testing.assert_allclose(
        out[0, 0], (100.0 - np.asarray(mean)) / np.asarray(std), atol=1e-4
    )


def test_flip_markers_survive_both_flips():
    # BoxList.transpose returns a new object; both cache markers must ride
    # along or h+v-flipped samples hit the h-only cache entry
    from PIL import Image as PILImage

    from maskrcnn_tpu.data.transforms import (
        RandomHorizontalFlip,
        RandomVerticalFlip,
    )
    from maskrcnn_tpu.structures.boxlist import BoxList

    img = PILImage.new("RGB", (32, 24))
    t = BoxList(np.asarray([[2.0, 3.0, 10.0, 12.0]]), (32, 24), mode="xyxy")
    img, t = RandomHorizontalFlip(prob=1.1)(img, t)
    img, t = RandomVerticalFlip(prob=1.1)(img, t)
    assert getattr(t, "_hflipped", False) is True
    assert getattr(t, "_vflipped", False) is True
    # flipping back h clears the h marker but keeps v
    img, t = RandomHorizontalFlip(prob=1.1)(img, t)
    assert getattr(t, "_hflipped", True) is False
    assert getattr(t, "_vflipped", False) is True
