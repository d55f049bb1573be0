import numpy as np

import jax
import jax.numpy as jnp

from maskrcnn_tpu.config import cfg
from maskrcnn_tpu.solver import make_optimizer
from maskrcnn_tpu.utils.checkpoint import Checkpointer

import pytest

pytestmark = pytest.mark.heavy


def make_params(key):
    k1, k2 = jax.random.split(key)
    return {
        "backbone": {
            "stem": {"conv1": {"w": jax.random.normal(k1, (3, 3, 3, 8))}},
            "layer1": [
                {"conv1": {"w": jax.random.normal(k2, (1, 1, 8, 8)),
                           "b": jnp.zeros(8)}},
            ],
        },
    }


def test_save_load_roundtrip(tmp_path):
    params = make_params(jax.random.PRNGKey(0))
    c = cfg.clone()
    tx, _ = make_optimizer(c, params)
    opt_state = tx.init(params)

    ckpt = Checkpointer(save_dir=str(tmp_path), save_to_disk=True)
    ckpt.save("model_0000010", params, opt_state, iteration=10)

    assert ckpt.has_checkpoint()
    params2 = make_params(jax.random.PRNGKey(1))  # different values
    opt2 = tx.init(params2)
    loaded, opt_loaded, extra = ckpt.load("", params=params2, opt_state=opt2)
    assert int(extra["iteration"]) == 10
    np.testing.assert_allclose(
        np.asarray(loaded["backbone"]["stem"]["conv1"]["w"]),
        np.asarray(params["backbone"]["stem"]["conv1"]["w"]),
    )
    # optimizer leaves restored in flatten order
    l1 = jax.tree.leaves(opt_state)
    l2 = jax.tree.leaves(opt_loaded)
    assert len(l1) == len(l2)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_auto_resume_prefers_last_checkpoint(tmp_path):
    params = make_params(jax.random.PRNGKey(0))
    ckpt = Checkpointer(save_dir=str(tmp_path), save_to_disk=True)
    ckpt.save("model_0000005", params, iteration=5)
    ckpt.save("model_0000015", jax.tree.map(lambda x: x * 2, params), iteration=15)
    template = make_params(jax.random.PRNGKey(2))
    loaded, _, extra = ckpt.load("some_ignored_file", params=template)
    assert int(extra["iteration"]) == 15
    np.testing.assert_allclose(
        np.asarray(loaded["backbone"]["stem"]["conv1"]["w"]),
        2 * np.asarray(params["backbone"]["stem"]["conv1"]["w"]),
    )


def test_partial_load_keeps_template(tmp_path):
    params = make_params(jax.random.PRNGKey(0))
    ckpt = Checkpointer(save_dir=str(tmp_path), save_to_disk=True)
    ckpt.save("model_a", {"backbone": params["backbone"]})
    template = make_params(jax.random.PRNGKey(3))
    template["extra_head"] = {"w": jnp.ones((4, 4))}
    loaded, _, _ = ckpt.load("", params=template)
    np.testing.assert_allclose(np.asarray(loaded["extra_head"]["w"]), 1.0)
    np.testing.assert_allclose(
        np.asarray(loaded["backbone"]["stem"]["conv1"]["w"]),
        np.asarray(params["backbone"]["stem"]["conv1"]["w"]),
    )


def test_none_placeholder_leaves_roundtrip(tmp_path):
    """Param trees may contain None placeholders (e.g. the RetinaNet FPN has
    no P2 lateral, models/fpn.py init_fpn). Save must skip them and load
    must restore them structurally — not as object arrays."""
    params = {
        "fpn": {"inner": [None, {"w": np.ones((2, 2), np.float32)}],
                "layer": [None, {"w": np.zeros((3,), np.float32)}]},
    }
    ck = Checkpointer(save_dir=str(tmp_path), save_to_disk=True)
    ck.save("model_0000001", params)
    template = {
        "fpn": {"inner": [None, {"w": np.zeros((2, 2), np.float32)}],
                "layer": [None, {"w": np.ones((3,), np.float32)}]},
    }
    loaded, _, _ = ck.load(params=template)
    assert loaded["fpn"]["inner"][0] is None
    assert loaded["fpn"]["layer"][0] is None
    np.testing.assert_array_equal(loaded["fpn"]["inner"][1]["w"], np.ones((2, 2)))
    np.testing.assert_array_equal(loaded["fpn"]["layer"][1]["w"], np.zeros((3,)))
