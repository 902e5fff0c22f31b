"""Checkpoint IO.

Native format: ``.npz`` holding flattened ``collection/path/to/leaf`` arrays —
dependency-free, fast to mmap, and orbax-free for single-model inference
weights. Training state uses orbax (parallel/train_state.py). Reference
``.pth`` files are converted on the fly via utils/torch_convert (parity:
utils/cfg.py:88-154 load path).
"""

from __future__ import annotations

import numpy as np


SEP = "//"


def flatten_tree(tree: dict, prefix: str = "") -> dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        path = f"{prefix}{SEP}{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten_tree(v, path))
        else:
            out[path] = np.asarray(v)
    return out


def unflatten_tree(flat: dict) -> dict:
    tree: dict = {}
    for path, v in flat.items():
        keys = path.split(SEP)
        node = tree
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = v
    return tree


def save_npz(path: str, embedder_vars: dict, extractor_vars: dict) -> None:
    flat = {}
    flat.update({f"embedder{SEP}{k}": v for k, v in flatten_tree(embedder_vars).items()})
    flat.update({f"extractor{SEP}{k}": v for k, v in flatten_tree(extractor_vars).items()})
    np.savez(path, **flat)


def load_npz(path: str) -> tuple[dict, dict]:
    data = np.load(path)
    tree = unflatten_tree({k: data[k] for k in data.files})
    return tree.get("embedder", {}), tree.get("extractor", {})


def _check_and_cast(loaded: dict, template: dict, where: str = "") -> dict:
    """Validate loaded tree against the init template (shape check + dtype cast)."""
    out = {}
    for k, tv in template.items():
        w = f"{where}/{k}"
        if k not in loaded:
            raise KeyError(f"checkpoint missing {w}")
        lv = loaded[k]
        if isinstance(tv, dict):
            out[k] = _check_and_cast(lv, tv, w)
        else:
            lv = np.asarray(lv)
            if tuple(lv.shape) != tuple(tv.shape):
                raise ValueError(f"shape mismatch at {w}: ckpt {lv.shape} vs model {tv.shape}")
            out[k] = lv.astype(np.asarray(tv).dtype)
    return out


def load_into(path: str, card: dict, embedder_vars: dict, extractor_vars: dict):
    """Load .npz (native) or .pth (reference torch) into init-shaped variables."""
    if path.endswith(".pth") or path.endswith(".pt"):
        from . import torch_convert as tc
        sd = tc.load_torch_state_dict(path)
        emb, ext = tc.convert_model(sd, card)
    else:
        emb, ext = load_npz(path)
    return (_check_and_cast(emb, embedder_vars, "embedder"),
            _check_and_cast(ext, extractor_vars, "extractor"))
