from . import nerf_volume, neus_volume, occupancy  # noqa: F401
