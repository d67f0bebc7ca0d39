from . import hashgrid, math, networks, render  # noqa: F401
from . import attention, grid_sample  # noqa: F401
