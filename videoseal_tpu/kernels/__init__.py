from .fused_blend import fused_jnd_blend, supports_fused_blend  # noqa: F401
