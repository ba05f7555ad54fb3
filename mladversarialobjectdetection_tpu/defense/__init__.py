from . import defender, masker  # noqa: F401
