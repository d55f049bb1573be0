"""Dynamic module import by path (reference utils/imports.py)."""

import importlib.util


def import_file(module_name, file_path, make_importable=False):
    spec = importlib.util.spec_from_file_location(module_name, file_path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    if make_importable:
        import sys

        sys.modules[module_name] = module
    return module
