"""Reference-implementation oracle for numerical parity tests.

Imports the actual reference framework (/root/reference, read-only) on CPU
torch and uses it as ground truth. Missing deps are shimmed:
  * yacs -> our CfgNode
  * apex.amp.float_function -> identity
  * maskrcnn_benchmark._C -> the reference's own CPU C++ ops, JIT-compiled
    by torch.utils.cpp_extension from patched COPIES in /tmp (two
    deprecated ATen calls fixed; sources untouched in the repo)

Nothing from here ships in the framework — tests only.
"""

import glob
import os
import shutil
import subprocess
import sys
import types

REF = "/root/reference"
PATCH_DIR = "/tmp/refC"

_ext = None
_ready = False


def reference_available():
    return os.path.isdir(REF)


def build_ref_extension():
    global _ext
    if _ext is not None:
        return _ext
    import torch
    from torch.utils import cpp_extension

    os.makedirs(PATCH_DIR + "/cpu", exist_ok=True)
    for f in glob.glob(REF + "/maskrcnn_benchmark/csrc/*.h"):
        shutil.copy(f, PATCH_DIR)
    shutil.copy(REF + "/maskrcnn_benchmark/csrc/vision.cpp", PATCH_DIR)
    for f in glob.glob(REF + "/maskrcnn_benchmark/csrc/cpu/*"):
        shutil.copy(f, PATCH_DIR + "/cpu")
    subprocess.run(
        ["sed", "-i", "-e", "s/\\.type(), /.scalar_type(), /g",
         "-e", "s/dets\\.type() == scores\\.scalar_type()/dets.scalar_type() == scores.scalar_type()/"]
        + glob.glob(PATCH_DIR + "/cpu/*.cpp"),
        check=True,
    )
    _ext = cpp_extension.load(
        name="ref_C",
        sources=[PATCH_DIR + "/vision.cpp"] + sorted(glob.glob(PATCH_DIR + "/cpu/*.cpp")),
        extra_include_paths=[PATCH_DIR],
        with_cuda=False,
        verbose=False,
    )
    return _ext


def setup_reference():
    """Make `import maskrcnn_benchmark` work. Returns the ref cfg module."""
    global _ready
    if _ready:
        import maskrcnn_benchmark  # noqa

        from maskrcnn_benchmark.config import cfg

        return cfg
    sys.path.insert(0, REF)

    from maskrcnn_tpu.config.cfgnode import CfgNode

    yacs = types.ModuleType("yacs")
    yacs_config = types.ModuleType("yacs.config")
    yacs_config.CfgNode = CfgNode
    yacs.config = yacs_config
    sys.modules["yacs"] = yacs
    sys.modules["yacs.config"] = yacs_config

    # the reference targets numpy<1.20 (np.float); restore the alias
    import numpy as np

    if not hasattr(np, "float"):
        np.float = float  # noqa: NPY001
    if not hasattr(np, "int"):
        np.int = int  # noqa: NPY001
    if not hasattr(np, "bool"):
        np.bool = bool  # noqa: NPY001

    apex = types.ModuleType("apex")
    amp = types.ModuleType("apex.amp")
    amp.float_function = lambda fn: fn
    apex.amp = amp
    sys.modules["apex"] = apex
    sys.modules["apex.amp"] = amp

    ext = build_ref_extension()
    import maskrcnn_benchmark

    maskrcnn_benchmark._C = ext
    sys.modules["maskrcnn_benchmark._C"] = ext

    _ready = True
    from maskrcnn_benchmark.config import cfg

    return cfg


def fresh_ref_cfg(yaml_path=None, opts=()):
    cfg = setup_reference()
    c = cfg.clone()
    if yaml_path:
        c.merge_from_file(yaml_path)
    if opts:
        c.merge_from_list(list(opts))
    c.merge_from_list(["MODEL.DEVICE", "cpu"])
    return c


def torch_state_to_numpy(module):
    import numpy as np

    return {k: v.detach().numpy().copy() for k, v in module.state_dict().items()}
