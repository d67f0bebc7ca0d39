from . import base, config, schedule  # noqa: F401
