from .detector import Detector  # noqa: F401
from .adv_patch import AdversarialPatch  # noqa: F401
from .streaming import Stream  # noqa: F401
