from . import attacker, artifacts  # noqa: F401
