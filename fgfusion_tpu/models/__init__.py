"""Model registry.

Mirrors the reference's dynamic registry surface
(models/__init__.py:11-29): models are addressed as
'<module>.<Class>' strings from configs, e.g.
'finegrained_regtr.RegTR'. We keep the same names so reference configs
work unchanged, while mapping onto this package's flax modules.
"""
from typing import Dict

_REGISTRY: Dict[str, type] = {}


def register_model(name: str):
    def deco(cls):
        _REGISTRY[name] = cls
        return cls
    return deco


def get_model(name: str):
    # import here to avoid circulars and keep registry lazily populated
    from . import regtr  # noqa: F401
    if name not in _REGISTRY:
        raise ValueError(
            f"unknown model {name!r}; available: {sorted(_REGISTRY)}")
    return _REGISTRY[name]
