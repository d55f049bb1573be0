"""String-keyed registry (reference utils/registry.py:9-46)."""


def _register_generic(module_dict, module_name, module):
    assert module_name not in module_dict
    module_dict[module_name] = module


class Registry(dict):
    """Extensible mapping; usable as decorator or direct call:

        REGISTRY = Registry()

        @REGISTRY.register("name")
        def f(...): ...
    """

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)

    def register(self, module_name, module=None):
        if module is not None:
            _register_generic(self, module_name, module)
            return module

        def register_fn(fn):
            _register_generic(self, module_name, fn)
            return fn

        return register_fn
