"""get_module: registry-driven class lookup.

Rebuild of /root/reference/ml3d/utils/builder.py:3-65 for the single JAX
backend: MODEL/DATASET/PIPELINE live in this package; SAMPLER classes live in
datasets.samplers. Importing the subpackages triggers registration.
"""

from .registry import (DATASET, MODEL, PIPELINE, SAMPLER, get_from_name)


def _ensure_registered(module_type):
    # Lazy imports so that `import open3d_ml_tpu.utils` has no heavy deps.
    import importlib
    pkg = "open3d_ml_tpu"
    targets = {
        "model": [f"{pkg}.models"],
        "dataset": [f"{pkg}.datasets"],
        "pipeline": [f"{pkg}.pipelines"],
        "sampler": [f"{pkg}.datasets.samplers"],
    }
    for mod in targets[module_type]:
        importlib.import_module(mod)


def get_module(module_type, module_name, framework=None, **kwargs):
    """Fetch a registered class by type ('model'|'dataset'|'pipeline'|'sampler')
    and name. ``framework`` is accepted for reference-API compat and ignored.
    """
    registries = {
        "model": MODEL,
        "dataset": DATASET,
        "pipeline": PIPELINE,
        "sampler": SAMPLER,
    }
    if module_type not in registries:
        raise KeyError(f"Unknown module type: {module_type!r}")
    _ensure_registered(module_type)
    return get_from_name(module_name, registries[module_type], framework)
