"""Registries mapping names -> classes.

Rebuild of the reference registry (/root/reference/ml3d/utils/registry.py:4-87).
The reference keeps one sub-registry per framework ({torch,tf}); this framework
has a single JAX backend, but the framework argument is kept (and ignored,
aliased to 'jax') so reference-style call sites keep working.
"""

_FRAMEWORK_ALIASES = {
    None: "jax",
    "": "jax",
    "jax": "jax",
    "tpu": "jax",
    # reference frameworks map onto the single backend for API compat
    "torch": "jax",
    "pytorch": "jax",
    "tf": "jax",
    "tensorflow": "jax",
}


def convert_framework_name(framework):
    """Normalize a framework name; everything maps to the JAX backend."""
    try:
        return _FRAMEWORK_ALIASES[framework if framework is None else str(
            framework).lower()]
    except KeyError:
        raise KeyError(f"Unknown framework: {framework!r}") from None


def convert_device_name(device, device_ids=None):
    """Normalize a device string. Accepts cpu/gpu/cuda/tpu."""
    device = (device or "tpu").lower()
    if device in ("tpu", "gpu", "cuda"):
        out = "tpu"
    elif device == "cpu":
        out = "cpu"
    else:
        raise KeyError(f"Unknown device: {device!r}")
    if device_ids is None:
        return out
    return out, list(device_ids)


class Registry:
    """name -> class map, keyed additionally by (normalized) framework."""

    def __init__(self, name):
        self._name = name
        self._modules = {"jax": {}}

    @property
    def name(self):
        return self._name

    def get(self, key, framework=None):
        fw = convert_framework_name(framework)
        return self._modules.get(fw, {}).get(key, None)

    def register_module(self, framework=None, name=None):
        def _register(cls):
            self._register_module(cls, framework=framework, name=name)
            return cls

        return _register

    def _register_module(self, module_class, framework=None, name=None):
        fw = convert_framework_name(framework)
        key = name if name is not None else module_class.__name__
        self._modules.setdefault(fw, {})[key] = module_class

    def keys(self, framework=None):
        fw = convert_framework_name(framework)
        return sorted(self._modules.get(fw, {}).keys())

    def __contains__(self, key):
        return any(key in mods for mods in self._modules.values())

    def __repr__(self):
        return (f"Registry(name={self._name}, "
                f"items={self.keys()})")


MODEL = Registry("model")
DATASET = Registry("dataset")
PIPELINE = Registry("pipeline")
SAMPLER = Registry("sampler")


def get_from_name(module_name, registry, framework=None):
    """Look a class up by name in a registry, raising with context."""
    if module_name is None:
        raise ValueError(f"Missing module name for registry {registry.name}")
    cls = registry.get(module_name, framework=framework)
    if cls is None:
        raise KeyError(f"{module_name!r} is not registered in "
                       f"{registry.name} registry. Available: "
                       f"{registry.keys(framework)}")
    return cls
