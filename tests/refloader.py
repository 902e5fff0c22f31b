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


def _ensure_torchvision_stub():
    """Fake torchvision whose models.vgg16() returns a RANDOM-INIT standard
    VGG16 feature stack. Lets the reference's watson_vgg/dists loss code (which
    builds on torchvision.models.vgg16(pretrained=True).features) run as a
    golden oracle without network access or the real package."""
    if "torchvision" in sys.modules:
        return
    import torch
    import torch.nn as nn

    def _vgg16_features():
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512, "M"]
        layers, c_in = [], 3
        for v in cfg:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers += [nn.Conv2d(c_in, v, 3, padding=1), nn.ReLU(inplace=False)]
                c_in = v
        return nn.Sequential(*layers)

    class _VGG(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = _vgg16_features()

    tv = types.ModuleType("torchvision")
    models = types.ModuleType("torchvision.models")
    transforms = types.ModuleType("torchvision.transforms")
    tfunc = types.ModuleType("torchvision.transforms.functional")
    utils = types.ModuleType("torchvision.utils")

    def vgg16(pretrained=False, **kw):
        torch.manual_seed(1234)  # deterministic "weights" across oracle builds
        return _VGG()

    class _NoOpTransform:
        """Constructor-compatible stand-in; never executed in golden tests."""

        def __init__(self, *a, **kw):
            pass

        def __call__(self, x):
            return x

    class _Compose(_NoOpTransform):
        def __init__(self, ts):
            self.ts = ts

    for name in ("ToTensor", "Resize", "CenterCrop", "ColorJitter",
                 "RandomHorizontalFlip", "Normalize", "RandomResizedCrop"):
        setattr(transforms, name, type(name, (_NoOpTransform,), {}))
    transforms.Compose = _Compose
    transforms.functional = tfunc
    utils.save_image = lambda *a, **kw: None

    models.vgg16 = vgg16
    tv.models = models
    tv.transforms = transforms
    tv.utils = utils
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.transforms.functional"] = tfunc
    sys.modules["torchvision.utils"] = utils


def _ensure_av_stub():
    """PyAV is absent; augmentation/video.py imports it at module level but
    the golden tests only exercise the dummy (identity) augmenter."""
    if "av" not in sys.modules:
        sys.modules["av"] = types.ModuleType("av")


def ref_root():
    """Mount the WHOLE reference package as 'vsref' (relative imports across
    subpackages work), for composition-layer golden tests:
    ref_root(); importlib.import_module('vsref.models.videoseal')."""
    _ensure_timm_stub()
    _ensure_torchvision_stub()
    _ensure_av_stub()
    return _mount("vsref", REF)


def ref_module(name: str):
    """Import e.g. 'modules.unet', 'losses.ssim', 'models.blender' from the reference."""
    _ensure_timm_stub()
    if name in ("losses.watson_vgg", "losses.dists"):
        _ensure_torchvision_stub()
    sub, mod = name.split(".", 1)
    _mount(f"vsref_{sub}", f"{REF}/{sub}")
    return importlib.import_module(f"vsref_{sub}.{mod}")
