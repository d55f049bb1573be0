"""Environment customization hook (reference utils/env.py:7-37).

If MASKRCNN_TPU_ENV_MODULE is set, import that module before setup so user
environments can patch paths/config (the reference used
TORCH_DETECTRON_ENV_MODULE for the same purpose).
"""

import importlib
import os


def setup_environment():
    custom_module_path = os.environ.get("MASKRCNN_TPU_ENV_MODULE")
    if custom_module_path:
        setup_custom_environment(custom_module_path)


def setup_custom_environment(custom_module_path):
    if os.path.isfile(custom_module_path):
        from .imports import import_file

        module = import_file("maskrcnn_tpu.utils.env.custom_module",
                             custom_module_path)
    else:
        module = importlib.import_module(custom_module_path)
    assert hasattr(module, "setup_environment") and callable(
        module.setup_environment
    ), (
        "Custom environment module defined in {} does not have the required "
        "callable attribute 'setup_environment'.".format(custom_module_path)
    )
    module.setup_environment()


setup_environment()
