"""Environment info dump (reference utils/collect_env.py)."""

import platform
import sys


def collect_env_info():
    lines = []
    lines.append("sys.platform: {}".format(sys.platform))
    lines.append("Python: {}".format(sys.version.replace("\n", "")))
    lines.append("Machine: {}".format(platform.machine()))
    try:
        import jax

        lines.append("JAX: {}".format(jax.__version__))
        lines.append("Devices: {}".format(jax.devices()))
        lines.append("Process count: {}".format(jax.process_count()))
    except Exception as e:  # pragma: no cover
        lines.append("JAX: unavailable ({})".format(e))
    try:
        import numpy

        lines.append("NumPy: {}".format(numpy.__version__))
    except Exception:
        pass
    return "\n".join(lines)
