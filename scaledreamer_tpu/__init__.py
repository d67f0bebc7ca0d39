"""ScaleDreamer-TPU: a TPU-native text-to-3D score-distillation framework.

A ground-up JAX/Flax/Pallas rebuild of the capabilities of ScaleDreamer
(threestudio-based; see reference `threestudio/__init__.py:1-56` for the
registry contract this module honors): a string-keyed plugin registry that
config YAML uses to select implementations by name, including the dynamic
multiple-inheritance syntax ``"main:sub1,sub2"``.

Unlike the reference (PyTorch Lightning + CUDA extension libraries), every
compute-path component here is a pure-JAX/Flax module compiled by XLA into a
single jitted train step, with Pallas kernels for the hot ray-marching ops.
"""

__version__ = "0.1.0"

__modules__ = {}


def register(name):
    """Class decorator: register a component under a string name.

    Mirrors the reference registry semantics (threestudio/__init__.py:4-16):
    re-registration of the same name raises unless the class is identical.
    """

    def decorator(cls):
        if name in __modules__ and __modules__[name] is not cls:
            raise ValueError(
                f"Component '{name}' already registered by {__modules__[name]!r}"
            )
        __modules__[name] = cls
        cls.registered_name = name
        return cls

    return decorator


def find(name):
    """Resolve a registered name to its class.

    Supports the dynamic multiple-inheritance syntax ``"base:mixin1,mixin2"``
    (reference threestudio/__init__.py:18-32): fabricates a new type whose MRO
    is (mixin1, mixin2, ..., base).
    """
    if ":" in name:
        main_name, mixin_names = name.split(":")
        mixins = [find(m) for m in mixin_names.split(",")]
        base = find(main_name)
        return type(f"{base.__name__}With{'And'.join(m.__name__ for m in mixins)}",
                    (*mixins, base), {})
    if name not in __modules__:
        raise KeyError(
            f"Unknown component '{name}'. Registered: {sorted(__modules__)}"
        )
    return __modules__[name]


def _register_builtins():
    """Import all built-in component modules so their @register calls run."""
    import importlib

    for mod in (
        "data",
        "models.geometry",
        "models.materials",
        "models.background",
        "models.renderers",
        "models.guidance",
        "models.prompt_processors",
        "models.exporters",
        "systems",
    ):
        importlib.import_module(f".{mod}", __name__)


_BUILTINS_LOADED = False


def ensure_builtins():
    global _BUILTINS_LOADED
    if not _BUILTINS_LOADED:
        _register_builtins()
        _BUILTINS_LOADED = True
