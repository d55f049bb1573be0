"""Model zoo URL caching (reference utils/model_zoo.py:20-61).

Rank-0 downloads, others wait at a barrier. In zero-egress environments the
cache directory can be pre-populated (MASKRCNN_TPU_CACHE or ~/.cache).
"""

import os
import sys
from urllib.parse import urlparse

from . import comm


def cache_url(url, model_dir=None):
    if model_dir is None:
        model_dir = os.environ.get(
            "MASKRCNN_TPU_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "maskrcnn_tpu"),
        )
    os.makedirs(model_dir, exist_ok=True)
    parts = urlparse(url)
    filename = os.path.basename(parts.path)
    if parts.query:
        filename = filename + "_" + parts.query.replace("/", "_")
    cached_file = os.path.join(model_dir, filename)
    if not os.path.exists(cached_file) and comm.is_main_process():
        sys.stderr.write("Downloading: {} to {}\n".format(url, cached_file))
        import urllib.request

        urllib.request.urlretrieve(url, cached_file)
    comm.synchronize()
    if not os.path.exists(cached_file):
        raise RuntimeError(
            "weight file {} not available (no network egress?) — place it at "
            "{} manually".format(url, cached_file)
        )
    return cached_file
