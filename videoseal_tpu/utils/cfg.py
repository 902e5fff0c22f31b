"""Model cards and model construction (parity: videoseal/utils/cfg.py).

`load(name_or_path)` resolves a model card under videoseal_tpu/cards/*.yaml,
builds embedder + extractor + JND + the VideoSeal pipeline, and (if available)
loads converted weights. Checkpoint downloads are not performed in this
environment (zero egress); pass a local path to converted weights instead.
"""

from __future__ import annotations

import os

import yaml

_CARDS_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "cards")
DEFAULT_CARD = "videoseal_1.0"
_ALIASES = {"videoseal": DEFAULT_CARD, "pixelseal": "pixelseal", "chunkyseal": "chunkyseal"}


def available_cards() -> list[str]:
    return sorted(f[:-5] for f in os.listdir(_CARDS_DIR) if f.endswith(".yaml"))


def load_card(name: str) -> dict:
    name = _ALIASES.get(name, name)
    path = name if name.endswith(".yaml") else os.path.join(_CARDS_DIR, f"{name}.yaml")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"Unknown model card {name!r}; available: {available_cards()}")
    with open(path) as f:
        return yaml.safe_load(f)


def setup_model_from_model_card(name_or_path: str, checkpoint: str | None = None, seed: int = 0):
    """Build a VideoSeal model from a card (parity: utils/cfg.py:181-251)."""
    from ..models.videoseal import VideoSeal

    card = load_card(name_or_path)
    return VideoSeal.from_card(card, checkpoint=checkpoint, seed=seed)


_CONFIGS_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "configs")


def _resolve_config_path(cfg_path: str) -> str:
    """Working dir first, then the package configs dir (cfg.py:42-49)."""
    if os.path.isfile(cfg_path):
        return cfg_path
    return os.path.join(_CONFIGS_DIR, os.path.basename(cfg_path))


def _checkpoint_args(ckpt_path: str) -> dict:
    """Read the training-args dict embedded in a checkpoint.

    Reference ``.pth`` files store ``checkpoint['args']`` (dict or YAML
    string, train.py's save dict); native ``.npz`` files store a JSON blob
    under ``__args__`` (utils/checkpoint.save_npz).
    """
    if ckpt_path.endswith((".pth", ".pt")):
        import torch

        ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
        if not isinstance(ckpt, dict) or "args" not in ckpt:
            raise KeyError(f"{ckpt_path} has no embedded 'args' "
                           "(cannot rebuild a model from a bare state_dict; "
                           "name a model card instead)")
        args = ckpt["args"]
        if isinstance(args, (str, bytes)):
            args = yaml.safe_load(args)
        return dict(args)
    import json

    import numpy as np

    data = np.load(ckpt_path)
    if "__args__" not in data.files:
        raise KeyError(f"{ckpt_path} has no embedded '__args__' blob")
    return json.loads(bytes(data["__args__"].tobytes()).decode())


def get_config_from_checkpoint(ckpt_path: str) -> dict:
    """Rebuild a model-card dict from a checkpoint's embedded training args
    (parity: utils/cfg.py:52-85). The embedder/extractor sub-configs are
    resolved from configs/{embedder,extractor}.yaml preset files exactly like
    the reference resolves args.embedder_config / args.extractor_config.
    """
    args = _checkpoint_args(ckpt_path)
    # backward-compat arg spellings (cfg.py:101-118)
    if "img_size" not in args and "img_size_proc" not in args:
        if "img_size_extractor" in args:
            args["img_size_proc"] = args["img_size_extractor"]
    args.setdefault("hidden_size_multiplier", 2)

    def sub(kind: str) -> dict:
        cfg_file = _resolve_config_path(args.get(f"{kind}_config", f"{kind}.yaml"))
        with open(cfg_file) as f:
            presets = yaml.safe_load(f)
        model = args.get(f"{kind}_model") or presets["model"]
        if model not in presets:
            raise KeyError(f"{kind} preset {model!r} not in {cfg_file}")
        return {"model": model, "params": presets[model]}

    return {"args": args, "embedder": sub("embedder"), "extractor": sub("extractor"),
            "checkpoint_path": ckpt_path}


def setup_model_from_checkpoint(ckpt_path: str, seed: int = 0):
    """Build from 'baseline/<method>', a card name, or a bare checkpoint path
    (parity: utils/cfg.py:156-178)."""
    if "baseline" in ckpt_path:
        from ..models.baselines import build_baseline

        return build_baseline(ckpt_path)
    if not ckpt_path.endswith((".pth", ".pt", ".npz")) and "/" not in ckpt_path:
        return setup_model_from_model_card(ckpt_path, seed=seed)
    from ..models.videoseal import VideoSeal

    card = get_config_from_checkpoint(ckpt_path)
    return VideoSeal.from_card(card, checkpoint=ckpt_path, seed=seed)


def load(name_or_path: str = DEFAULT_CARD, checkpoint: str | None = None, seed: int = 0):
    """Public entry point (parity: videoseal/__init__.py:13-17).

    Accepts a card name ('videoseal_1.0'), 'baseline/<method>', or a bare
    checkpoint path (.pth/.npz with embedded args)."""
    if (name_or_path.endswith((".pth", ".pt", ".npz")) and checkpoint is None) \
            or "baseline" in name_or_path:
        return setup_model_from_checkpoint(name_or_path, seed=seed)
    return setup_model_from_model_card(name_or_path, checkpoint=checkpoint, seed=seed)
