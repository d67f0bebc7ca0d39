from . import amortized, base, losses, optimizers, scaledreamer  # noqa: F401
