from . import hashgrid, math, networks, render  # noqa: F401
