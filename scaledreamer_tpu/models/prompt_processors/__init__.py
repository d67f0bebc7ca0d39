from . import base, multi_prompt, stable_diffusion  # noqa: F401
