from . import efficientnet_blocks  # noqa: F401
