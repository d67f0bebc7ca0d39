from . import base, stable_diffusion  # noqa: F401
