from . import labeler, losses, schedules, trainer  # noqa: F401
