from . import efficientnet, bifpn, heads, efficientdet, unet  # noqa: F401
