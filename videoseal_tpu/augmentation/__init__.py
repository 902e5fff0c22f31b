from .augmenter import Augmenter, get_dummy_augmenter, build_augmenter  # noqa: F401
from .validation import get_validation_augs, get_validation_augs_subset  # noqa: F401
