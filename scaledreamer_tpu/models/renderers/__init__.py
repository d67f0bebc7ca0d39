from . import (generative_space_volsdf, mesh_rasterize,  # noqa: F401
               nerf_volume, neus_volume, occupancy, patch)
