from . import mesh_exporter  # noqa: F401
