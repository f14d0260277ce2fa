"""Name -> operator-factory registry.

The reference's "UDF API" is a plain name->factory map
(pkg/pipeline/plugin.go; plugins register themselves by name, e.g.
``processor_regex``). We reproduce that: each entry maps a reference
plugin name to a function ``(**config) -> (DataFrame -> DataFrame)``,
so a config-driven pipeline is just function composition.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

Transform = Callable[[DataFrame], DataFrame]
Factory = Callable[..., Transform]

OPERATORS: dict[str, Factory] = {}


def register(name: str) -> Callable[[Factory], Factory]:
    def deco(fn: Factory) -> Factory:
        OPERATORS[name] = fn
        return fn

    return deco


_MISSING = object()


def cfg_pop(cfg: dict, *names, default=_MISSING):
    """Pop the first present key among ``names`` (reference PascalCase
    and snake_case aliases). ``cfg.pop("A", cfg.pop("a"))`` is a trap:
    the inner pop evaluates eagerly and raises when only "A" exists.
    """
    for n in names:
        if n in cfg:
            return cfg.pop(n)
    if default is _MISSING:
        raise KeyError(f"config needs one of {names}")
    return default
