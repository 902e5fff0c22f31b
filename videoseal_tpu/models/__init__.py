from .videoseal import VideoSeal  # noqa: F401
from .embedder import build_embedder  # noqa: F401
from .extractor import build_extractor  # noqa: F401
