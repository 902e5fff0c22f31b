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


def load(name_or_path: str = DEFAULT_CARD, checkpoint: str | None = None, seed: int = 0):
    """Public entry point (parity: videoseal/__init__.py:13-17)."""
    return setup_model_from_model_card(name_or_path, checkpoint=checkpoint, seed=seed)
