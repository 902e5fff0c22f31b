"""Load reference (PyTorch) modules from /root/reference as golden test oracles.

The reference package itself is not importable here (its __init__ pulls in
omegaconf / torchvision, absent from this image), so we mount individual
subpackages under synthetic package names and stub the few missing third-party
symbols (timm's DropPath / trunc_normal_). The reference code is used ONLY to
produce golden outputs in tests — the framework under test shares no code with it.
"""

import importlib
import sys
import types

REF = "/root/reference/videoseal"


def _ensure_timm_stub():
    if "timm" in sys.modules:
        return
    import torch
    import torch.nn as nn

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = torch.bernoulli(torch.full(shape, keep, device=x.device))
            return x * mask / keep

    layers.DropPath = DropPath
    layers.trunc_normal_ = torch.nn.init.trunc_normal_
    models.layers = layers
    timm.models = models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers


def _mount(pkg_name: str, path: str):
    if pkg_name in sys.modules:
        return sys.modules[pkg_name]
    pkg = types.ModuleType(pkg_name)
    pkg.__path__ = [path]
    sys.modules[pkg_name] = pkg
    return pkg


def ref_module(name: str):
    """Import e.g. 'modules.unet', 'losses.ssim', 'models.blender' from the reference."""
    _ensure_timm_stub()
    sub, mod = name.split(".", 1)
    _mount(f"vsref_{sub}", f"{REF}/{sub}")
    return importlib.import_module(f"vsref_{sub}.{mod}")
