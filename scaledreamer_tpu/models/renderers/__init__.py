from . import generative_space_volsdf, nerf_volume, neus_volume, occupancy  # noqa: F401
