"""Checkpointing with the reference's resume contract.

Reference: maskrcnn_benchmark/utils/checkpoint.py:13-141 —
`model_{iter:07d}` files + a `last_checkpoint` tag for auto-resume, with
DetectronCheckpointer resolving catalog:// URIs / URLs / Caffe2 .pkl files
for initial weights.

Storage format: one .npz per checkpoint. Model params are saved by tree
path ("backbone/body/stem/conv1/w"); optimizer state is saved in flatten
order (the optimizer structure is reconstructed deterministically from cfg,
so flatten order is stable). Rank-0 writes only.
"""

import os

import jax
import numpy as np

from . import comm


def _flatten_params(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten_params(v, prefix + str(k) + "/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten_params(v, prefix + str(i) + "/"))
    else:
        # None is a structural placeholder (e.g. the RetinaNet FPN's absent
        # P2 lateral, models/fpn.py init_fpn) — preserve it, don't wrap it
        # into an object array
        out[prefix[:-1]] = None if tree is None else np.asarray(tree)
    return out


def _unflatten_params(flat):
    root = {}
    for path, val in flat.items():
        parts = path.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            # gaps can appear when None placeholders were skipped at save
            n = max(int(k) for k in keys) + 1
            return [
                listify(node[str(i)]) if str(i) in node else None
                for i in range(n)
            ]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


class Checkpointer:
    def __init__(self, model=None, optimizer_state_template=None, save_dir="",
                 save_to_disk=None, logger=None):
        self.save_dir = save_dir
        self.save_to_disk = (
            comm.is_main_process() if save_to_disk is None else save_to_disk
        )
        self.logger = logger

    def _log(self, msg):
        if self.logger:
            self.logger.info(msg)

    def save(self, name, params, opt_state=None, **kwargs):
        if not self.save_dir or not self.save_to_disk:
            return
        os.makedirs(self.save_dir, exist_ok=True)
        data = {}
        params_np = jax.tree.map(np.asarray, params)
        for k, v in _flatten_params(params_np).items():
            if v is None:  # structural placeholder; init recreates it
                continue
            data["model/" + k] = v
        if opt_state is not None:
            leaves = jax.tree.leaves(opt_state)
            for i, leaf in enumerate(leaves):
                data["opt/{:06d}".format(i)] = np.asarray(leaf)
        for k, v in kwargs.items():
            data["extra/" + k] = np.asarray(v)
        path = os.path.join(self.save_dir, "{}.npz".format(name))
        np.savez(path, **data)
        self._log("Saving checkpoint to {}".format(path))
        self.tag_last_checkpoint(path)

    def tag_last_checkpoint(self, path):
        with open(os.path.join(self.save_dir, "last_checkpoint"), "w") as f:
            f.write(path)

    def has_checkpoint(self):
        return os.path.exists(os.path.join(self.save_dir, "last_checkpoint"))

    def get_checkpoint_file(self):
        try:
            with open(os.path.join(self.save_dir, "last_checkpoint")) as f:
                return f.read().strip()
        except OSError:
            return ""

    def load(self, f=None, params=None, opt_state=None):
        """Returns (params, opt_state, extra_dict). If a resume checkpoint
        exists in save_dir it wins over `f` (reference checkpoint.py:57-66).
        `params` is the freshly initialized tree (for structure and for
        partial loads); `opt_state` likewise."""
        if self.has_checkpoint():
            f = self.get_checkpoint_file()
        if not f:
            self._log("No checkpoint found. Initializing model from scratch")
            return params, opt_state, {}
        self._log("Loading checkpoint from {}".format(f))
        return self._load_file(f, params, opt_state)

    def _load_file(self, f, params, opt_state):
        data = np.load(f, allow_pickle=True)
        flat = {}
        opt_leaves = {}
        extra = {}
        for k in data.files:
            if k.startswith("model/"):
                flat[k[len("model/"):]] = data[k]
            elif k.startswith("opt/"):
                opt_leaves[int(k[len("opt/"):])] = data[k]
            elif k.startswith("extra/"):
                v = data[k]
                extra[k[len("extra/"):]] = v.item() if v.ndim == 0 else v
        loaded_params = _unflatten_params(flat)
        if params is not None:
            loaded_params = _merge_matching(params, loaded_params, self._log)
        if opt_state is not None and opt_leaves:
            leaves, treedef = jax.tree.flatten(opt_state)
            assert len(leaves) == len(opt_leaves), (
                "optimizer state shape mismatch: {} vs {}".format(
                    len(leaves), len(opt_leaves)
                )
            )
            opt_state = jax.tree.unflatten(
                treedef, [opt_leaves[i] for i in range(len(leaves))]
            )
        return loaded_params, opt_state, extra


def _merge_matching(template, loaded, log):
    """Copy loaded leaves whose path+shape match the template; keep the
    template's values elsewhere (fuzzy alignment is done by the weight
    importers before this point)."""
    t_flat = _flatten_params(jax.tree.map(np.asarray, template))
    l_flat = _flatten_params(loaded)
    merged = {}
    missing = []
    for k, v in t_flat.items():
        if v is None:
            merged[k] = None
        elif k in l_flat and l_flat[k] is not None and l_flat[k].shape == v.shape:
            merged[k] = l_flat[k].astype(v.dtype)
        else:
            merged[k] = v
            missing.append(k)
    if missing and log:
        log("Params not found in checkpoint (kept init): {} of {}".format(
            len(missing), len(t_flat)))
    return _unflatten_params(merged)


class DetectronCheckpointer(Checkpointer):
    """Adds catalog:// and Caffe2 .pkl resolution (checkpoint.py:101-141)."""

    def __init__(self, cfg, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.cfg = cfg.clone() if hasattr(cfg, "clone") else cfg

    def _load_file(self, f, params, opt_state):
        if f.startswith("catalog://"):
            from ..config.paths_catalog import ModelCatalog

            catalog_f = ModelCatalog.get(f[len("catalog://"):])
            self._log("{} points to {}".format(f, catalog_f))
            f = catalog_f
        if f.startswith("http"):
            from .model_zoo import cache_url

            cached = cache_url(f)
            self._log("url {} cached in {}".format(f, cached))
            f = cached
        if f.endswith(".pkl"):
            from .c2_loading import load_c2_weights

            loaded = load_c2_weights(f, self.cfg, params)
            return loaded, opt_state, {}
        return super()._load_file(f, params, opt_state)
