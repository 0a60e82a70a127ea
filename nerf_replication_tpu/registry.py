"""Component registry.

The reference selects every pluggable component by a ``*_module`` config
string and loads it with the deprecated ``imp.load_source``
(src/models/make_network.py:4-8, src/datasets/make_dataset.py:16-29, ...).
We keep the same YAML keys/values as registry names and resolve them
through this registry; unknown names fall back to ``importlib`` so user
extensions keep working by real dotted path.

Registered objects are factories: ``factory(cfg, **kwargs) -> component``.
"""

from __future__ import annotations

import importlib
from typing import Callable

_REGISTRY: dict[str, dict[str, Callable]] = {}

# reference module name -> (kind, our name); keeps shipped reference YAMLs
# working unmodified.
_ALIASES: dict[str, str] = {}


def register(kind: str, name: str, aliases: tuple[str, ...] = ()):
    """Decorator: register ``factory`` under ``kind/name`` (+ aliases)."""

    def deco(factory: Callable) -> Callable:
        _REGISTRY.setdefault(kind, {})[name] = factory
        for a in aliases:
            _ALIASES[f"{kind}:{a}"] = name
        return factory

    return deco


def resolve(kind: str, name: str) -> Callable:
    """Look up a factory by kind + name, following aliases, then importlib."""
    table = _REGISTRY.get(kind, {})
    name = _ALIASES.get(f"{kind}:{name}", name)
    if name in table:
        return table[name]
    # fall back: import a real module and use its conventional entry symbol
    module = importlib.import_module(name)
    for symbol in ("make", "Network", "Dataset", "Renderer", "NetworkWrapper", "Evaluator"):
        if hasattr(module, symbol):
            return getattr(module, symbol)
    raise KeyError(f"no factory for {kind}:{name} (registered: {sorted(table)})")


def registered(kind: str) -> list[str]:
    return sorted(_REGISTRY.get(kind, {}))
