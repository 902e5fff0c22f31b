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


def save_npz(path: str, embedder_vars: dict, extractor_vars: dict,
             args: dict | None = None) -> None:
    """Save model weights; `args` (the card's training-args dict) is embedded
    as a JSON blob so utils.cfg.get_config_from_checkpoint can rebuild the
    model without a card (parity: reference ckpts embed args, cfg.py:52-85)."""
    flat = {}
    flat.update({f"embedder{SEP}{k}": v for k, v in flatten_tree(embedder_vars).items()})
    flat.update({f"extractor{SEP}{k}": v for k, v in flatten_tree(extractor_vars).items()})
    if args is not None:
        import json

        blob = json.dumps(args).encode()
        flat["__args__"] = np.frombuffer(blob, dtype=np.uint8)
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


def save_train_state(path: str, state) -> None:
    """Flatten a parallel.trainer.TrainState to .npz (single-writer; call on
    process 0 only — parity: utils/dist.py:38-40 save_on_master)."""
    import jax

    host_state = jax.device_get(state)
    flat = {}
    for field in ("embedder_params", "embedder_stats", "extractor_params",
                  "disc_params", "opt_state_g", "opt_state_d"):
        sub = getattr(host_state, field)
        leaves, treedef = jax.tree_util.tree_flatten(sub)
        flat[f"__treedef__{field}"] = np.frombuffer(
            repr(treedef).encode(), dtype=np.uint8)
        for i, leaf in enumerate(leaves):
            flat[f"{field}{SEP}{i}"] = np.asarray(leaf)
    flat["step"] = np.asarray(host_state.step)
    flat["scaling_w"] = np.asarray(host_state.scaling_w)
    np.savez(path, **flat)


def load_train_state(path: str, template):
    """Restore into an existing (freshly created) TrainState template."""
    import jax

    data = np.load(path, allow_pickle=False)
    out = template
    for field in ("embedder_params", "embedder_stats", "extractor_params",
                  "disc_params", "opt_state_g", "opt_state_d"):
        sub = getattr(template, field)
        leaves, treedef = jax.tree_util.tree_flatten(sub)
        new_leaves = []
        for i, leaf in enumerate(leaves):
            arr = data[f"{field}{SEP}{i}"]
            if tuple(arr.shape) != tuple(np.asarray(leaf).shape):
                raise ValueError(f"shape mismatch restoring {field}[{i}]")
            new_leaves.append(arr)
        out = out.replace(**{field: jax.tree_util.tree_unflatten(treedef, new_leaves)})
    return out.replace(step=jnp_asarray(data["step"]),
                       scaling_w=jnp_asarray(data["scaling_w"]))


def jnp_asarray(x):
    import jax.numpy as jnp
    return jnp.asarray(x)


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


# ---------------------------------------------------------------------------
# Orbax: sharded, async-capable, multi-host checkpoints.
#
# The .npz path above is the single-host format (and what `load()` consumes
# for released weights). For multi-chip training the TrainState lives sharded
# across a Mesh; orbax writes each shard from its owning host (no host-0
# gather, no HBM->host blowup) and restores with the target sharding. Parity:
# the reference saves full torch state_dicts from rank 0 (train.py + dist) —
# on TPU pods that design would OOM the host; this is the TPU-native
# equivalent.
# ---------------------------------------------------------------------------

def save_train_state_orbax(ckpt_dir: str, state, step: int | None = None,
                           keep: int = 3) -> None:
    """Write a sharded orbax checkpoint of a parallel.trainer.TrainState.

    Call from ALL processes (collective). ckpt_dir holds one numbered
    subdirectory per step.
    """
    import jax
    import orbax.checkpoint as ocp

    step = int(step if step is not None else jax.device_get(state.step))
    opts = ocp.CheckpointManagerOptions(max_to_keep=keep, create=True)
    with ocp.CheckpointManager(ckpt_dir, options=opts) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()


def load_train_state_orbax(ckpt_dir: str, template, step: int | None = None):
    """Restore a TrainState with the TEMPLATE's shardings (resharding on
    mesh-shape change is automatic). Returns (state, step)."""
    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(ckpt_dir) as mgr:
        step = int(step if step is not None else mgr.latest_step())
        restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    return restored, step
