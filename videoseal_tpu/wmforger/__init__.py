"""WmForger sub-project (parity: /root/reference/wmforger/).

Trains an image *preference* model (real vs watermarked, ConvNeXt extractor
with nbits=0) against artificial FFT watermarks, with adversarial
gradient-perturbation hardening; plus a one-shot SGD forging/removal tool.
"""

from .generators import (FFTWatermarkWaves, FFTWatermarkGaussian,  # noqa: F401
                         FFTWatermarkLines, build_generator)
