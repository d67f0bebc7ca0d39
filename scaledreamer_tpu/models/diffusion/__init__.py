from . import unet, vae  # noqa: F401
