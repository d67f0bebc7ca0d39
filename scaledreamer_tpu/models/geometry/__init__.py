from . import base, implicit_sdf, implicit_volume  # noqa: F401
