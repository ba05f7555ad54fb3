from .image import parse_image_size, get_feat_sizes  # noqa: F401
from .log import get_logger  # noqa: F401
