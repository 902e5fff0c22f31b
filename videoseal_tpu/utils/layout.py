"""Layout helpers: the reference is NCHW (torch); this framework is NHWC (TPU).

Use these at the API boundary when porting data or comparing against torch
tensors. Everything inside videoseal_tpu is channels-last.
"""

import numpy as np


def nchw_to_nhwc(x):
    """(..., C, H, W) -> (..., H, W, C) for numpy arrays / jax arrays."""
    return np.moveaxis(np.asarray(x), -3, -1)


def nhwc_to_nchw(x):
    """(..., H, W, C) -> (..., C, H, W)."""
    return np.moveaxis(np.asarray(x), -1, -3)
