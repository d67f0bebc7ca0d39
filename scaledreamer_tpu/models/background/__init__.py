from . import backgrounds, multiprompt_hashgrid  # noqa: F401
