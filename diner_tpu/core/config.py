"""Config system: YAML -> registered factories.

Behavioral reference: the reference wires everything through OmegaConf YAML
with `module:` dotted paths resolved by arbitrary dynamic import
(src/util/import_helper.py:16-24, SURVEY.md §5.6). Here the same declarative
`module:` + `kwargs:` YAML shape resolves against an explicit registry — no
arbitrary import execution from config files.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Callable, Dict

import yaml

_REGISTRY: Dict[str, Callable] = {}


def register(name: str):
    """Decorator: register a class/factory under a stable config name."""
    def deco(obj):
        if name in _REGISTRY and _REGISTRY[name] is not obj:
            raise ValueError(f"duplicate registry name {name!r}")
        _REGISTRY[name] = obj
        return obj
    return deco


def resolve(name: str) -> Callable:
    if name not in _REGISTRY:
        # also accept reference-style dotted paths mapped to our names
        short = name.rsplit(".", 1)[-1]
        if short in _REGISTRY:
            return _REGISTRY[short]
        raise KeyError(f"{name!r} not registered; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def build(conf: Dict[str, Any], **extra):
    """Instantiate {"module": name, "kwargs": {...}} from the registry."""
    kwargs = dict(conf.get("kwargs") or {})
    kwargs.update(extra)
    return resolve(conf["module"])(**kwargs)


def load_config(path) -> Dict[str, Any]:
    with open(Path(path)) as f:
        return yaml.safe_load(f)


def registry_names():
    return sorted(_REGISTRY)
