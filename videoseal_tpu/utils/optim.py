"""Optimizer / scheduler construction (parity: videoseal/utils/optim.py).

Same mini-DSLs as the reference:
  build_optimizer("AdamW,lr=1e-4")                       (optim.py:86-144)
  build_lr_schedule("CosineLRScheduler,lr_min=1e-6,t_initial=301,
                     warmup_lr_init=1e-8,warmup_t=5")    (timm-style)
  ScalingSchedule("Linear,scaling_min=0.2,epochs=500")   (optim.py:16-67)
mapped onto optax.
"""

from __future__ import annotations

import math
from typing import Any

import optax


def parse_params(s: str) -> dict[str, Any]:
    """'AdamW,lr=1e-4' -> {'name':'AdamW','lr':1e-4} (optim.py:86-98)."""
    s = s.replace(" ", "")
    name, *rest = s.split(",")
    out: dict[str, Any] = {"name": name}
    for kv in rest:
        if not kv:
            continue
        k, v = kv.split("=")
        try:
            out[k] = int(v)
        except ValueError:
            try:
                out[k] = float(v)
            except ValueError:
                out[k] = v
    return out


def build_optimizer(spec: str | dict, schedule=None) -> optax.GradientTransformation:
    """Map the reference's torch/timm optimizer names onto optax."""
    p = parse_params(spec) if isinstance(spec, str) else dict(spec)
    name = p.pop("name").lower()
    lr = schedule if schedule is not None else p.pop("lr", 1e-3)
    if schedule is not None:
        p.pop("lr", None)
    wd = p.pop("weight_decay", None)
    betas = (p.pop("beta1", 0.9), p.pop("beta2", 0.999))
    if name == "adamw":
        return optax.adamw(lr, b1=betas[0], b2=betas[1],
                           weight_decay=wd if wd is not None else 1e-2)
    if name == "adam":
        return optax.adam(lr, b1=betas[0], b2=betas[1])
    if name == "sgd":
        return optax.sgd(lr, momentum=p.pop("momentum", 0.0))
    if name == "lamb":
        return optax.lamb(lr)
    if name == "adafactor":
        return optax.adafactor(lr)
    raise NotImplementedError(f"optimizer {name}")


def build_lr_schedule(spec: str | None, steps_per_epoch: int = 1,
                      base_lr: float = 1e-3):
    """timm CosineLRScheduler-style spec -> optax schedule (per-step)."""
    if not spec or spec in ("None", "none"):
        return base_lr
    p = parse_params(spec)
    name = p.pop("name").lower()
    if "cosine" in name:
        total = int(p.get("t_initial", 100)) * steps_per_epoch
        warmup_t = int(p.get("warmup_t", 0)) * steps_per_epoch
        lr_min = float(p.get("lr_min", 0.0))
        warmup_init = float(p.get("warmup_lr_init", 0.0))
        return optax.warmup_cosine_decay_schedule(
            init_value=warmup_init, peak_value=base_lr,
            warmup_steps=max(warmup_t, 1), decay_steps=max(total, 2),
            end_value=lr_min)
    if "step" in name:
        decay_t = int(p.get("decay_t", 30)) * steps_per_epoch
        rate = float(p.get("decay_rate", 0.1))
        return optax.exponential_decay(base_lr, decay_t, rate, staircase=True)
    raise NotImplementedError(f"scheduler {name}")


class ScalingSchedule:
    """Schedule on an arbitrary pipeline attribute — used for
    blender scaling_w (optim.py:16-67; train.py:320-327)."""

    def __init__(self, spec: str | dict, initial_value: float):
        p = parse_params(spec) if isinstance(spec, str) else dict(spec)
        self.kind = p.get("name", "Linear").lower()
        self.initial = initial_value
        self.final = float(p.get("scaling_min", initial_value))
        self.start = int(p.get("start_epoch", 0))
        self.epochs = int(p.get("epochs", 1))

    def __call__(self, epoch: int) -> float:
        t = min(max(epoch - self.start, 0) / max(self.epochs, 1), 1.0)
        if t <= 0:
            return self.initial
        if self.kind.startswith("lin"):
            return self.initial + t * (self.final - self.initial)
        if self.kind.startswith("cos"):
            return self.final + 0.5 * (self.initial - self.final) * (1 + math.cos(math.pi * t))
        raise NotImplementedError(self.kind)
