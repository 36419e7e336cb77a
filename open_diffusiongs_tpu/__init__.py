"""open_diffusiongs_tpu — a TPU-native (JAX/XLA/Pallas/pjit) single-stage
image->3D Gaussian-Splatting diffusion framework.

Capability target: caiyuanhao1998/Open-DiffusionGS (a PyTorch+CUDA research
codebase).  This is a ground-up re-design for TPU, not a port: the compute
path is pure JAX + Pallas kernels, parallelism is jax.sharding over device
meshes, and the runtime around it is functional (TrainState in / TrainState
out) rather than Lightning callbacks.

Registry semantics mirror the reference (`diffusionGS/__init__.py:6-29`):
string names registered via the @register decorator, plus dotted-path
dynamic import in `find`.
"""

__version__ = "0.1.0"

__modules__ = {}


def register(name: str):
    """Class decorator registering `cls` under `name` (ref: diffusionGS/__init__.py:6-17)."""

    def decorator(cls):
        if name in __modules__ and __modules__[name] is not cls:
            raise ValueError(f"Module {name} already registered as {__modules__[name]}")
        __modules__[name] = cls
        return cls

    return decorator


def find(name: str):
    """Look up a registered class by name; dotted paths are dynamically
    imported (ref: diffusionGS/__init__.py:20-29)."""
    if name in __modules__:
        return __modules__[name]
    if "." in name:
        import importlib

        module_name, cls_name = name.rsplit(".", 1)
        module = importlib.import_module(module_name)
        return getattr(module, cls_name)
    raise KeyError(f"Unknown module: {name!r}; known: {sorted(__modules__)}")


def _register_builtins():
    """Import submodules for their @register side effects (ref __init__.py:52)."""
    from .data import objaverse as _obja  # noqa: F401
    from .data import re10k as _re10k  # noqa: F401
    from .systems import object_system as _obj  # noqa: F401
    from .systems import scene_system as _scene  # noqa: F401
