from . import backgrounds  # noqa: F401
