from . import (generative_space_volsdf, nerf_volume, neus_volume,  # noqa: F401
               occupancy, patch)
