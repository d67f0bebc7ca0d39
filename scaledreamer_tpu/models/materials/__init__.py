from . import no_material  # noqa: F401
