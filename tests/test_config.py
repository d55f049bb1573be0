import os

import pytest

from maskrcnn_tpu.config import cfg
from maskrcnn_tpu.config.cfgnode import CfgNode

REFERENCE_CONFIG_DIR = "/root/reference/configs"


def test_defaults_basic():
    c = cfg.clone()
    assert c.MODEL.META_ARCHITECTURE == "GeneralizedRCNN"
    assert c.MODEL.RPN.PRE_NMS_TOP_N_TRAIN == 12000
    assert c.MODEL.ROI_BOX_HEAD.NUM_CLASSES == 81


def test_merge_from_list_coercion():
    c = cfg.clone()
    c.merge_from_list(["SOLVER.BASE_LR", "0.02", "MODEL.MASK_ON", "True"])
    assert c.SOLVER.BASE_LR == 0.02
    assert c.MODEL.MASK_ON is True
    c.merge_from_list(["MODEL.RPN.ANCHOR_SIZES", "(64, 128)"])
    assert c.MODEL.RPN.ANCHOR_SIZES == (64, 128)


def test_freeze():
    c = cfg.clone()
    c.freeze()
    with pytest.raises(AttributeError):
        c.MODEL.MASK_ON = True
    c.defrost()
    c.MODEL.MASK_ON = True


def test_unknown_key_rejected():
    c = cfg.clone()
    with pytest.raises(KeyError):
        c.merge_from_list(["MODEL.NO_SUCH_KEY", "1"])


def test_clone_independent():
    c = cfg.clone()
    c.SOLVER.BASE_LR = 123.0
    assert cfg.SOLVER.BASE_LR != 123.0


@pytest.mark.skipif(
    not os.path.isdir(REFERENCE_CONFIG_DIR),
    reason="reference configs not mounted",
)
def test_merge_all_reference_yamls():
    """Every YAML shipped with the reference must merge cleanly (the config
    surface is the compatibility contract; reference tests/test_configs.py)."""
    n = 0
    for root, _, files in os.walk(REFERENCE_CONFIG_DIR):
        for fn in files:
            if not fn.endswith(".yaml"):
                continue
            c = cfg.clone()
            c.merge_from_file(os.path.join(root, fn))
            n += 1
    assert n > 30


def test_yaml_roundtrip(tmp_path):
    c = cfg.clone()
    c.SOLVER.BASE_LR = 0.01
    p = tmp_path / "cfg.yaml"
    p.write_text(c.dump())
    c2 = cfg.clone()
    c2.merge_from_file(str(p))
    assert c2.SOLVER.BASE_LR == 0.01
    assert isinstance(c2.MODEL, CfgNode)


def test_merge_all_shipped_yamls():
    """Every YAML shipped in configs/ merges cleanly, and the shipped set
    mirrors the reference's 66-file tree 1:1 when the reference is
    mounted."""
    import glob

    repo = os.path.join(os.path.dirname(__file__), "..")
    shipped = sorted(
        os.path.relpath(p, os.path.join(repo, "configs"))
        for p in glob.glob(os.path.join(repo, "configs", "**", "*.yaml"),
                           recursive=True)
    )
    assert len(shipped) >= 66
    for rel in shipped:
        c = cfg.clone()
        c.merge_from_file(os.path.join(repo, "configs", rel))
    if os.path.isdir(REFERENCE_CONFIG_DIR):
        ref = sorted(
            os.path.relpath(p, REFERENCE_CONFIG_DIR)
            for p in glob.glob(os.path.join(REFERENCE_CONFIG_DIR, "**", "*.yaml"),
                               recursive=True)
        )
        missing = set(ref) - set(shipped)
        assert not missing, missing
