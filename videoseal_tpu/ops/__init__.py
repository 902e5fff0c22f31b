from .color import rgb_to_yuv, yuv_to_rgb, rgb_to_y  # noqa: F401
from .resize import resize_bilinear, resize_to  # noqa: F401
