from .perceptual import build_perceptual_loss, PerceptualLoss  # noqa: F401
from .videosealloss import VideoSealLoss  # noqa: F401
