from . import draw  # noqa: F401
