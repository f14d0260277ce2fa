"""Operator library: pure functions DataFrame -> DataFrame.

Each operator mirrors one reference plugin's semantics (cited in its
docstring) re-expressed as a Catalyst-friendly plan. A registry keyed
by the reference plugin names lets YAML-style pipeline configs
assemble chains exactly like the reference's collection configs
(core/config/CollectionConfig.h:35-41).
"""

from ilogtail_spark.operators.registry import OPERATORS, register

# importing the submodules populates the registry (each plugin
# registers by reference name, mirroring plugins.yml's import manifest)
from ilogtail_spark.operators import (  # noqa: E402,F401
    agg,
    filters,
    influx,
    otel,
    parse,
    pb,
    prom,
    route,
    split,
    transform,
)
from ilogtail_spark.functions import grok  # noqa: E402,F401

# registering modules OUTSIDE this package (ordered after
# operators.parse — plans.spl imports it at module level). Without
# these, registry completeness depends on which query/test imported
# first (a q58-first bench run hit KeyError: 'processor_spl').
from ilogtail_spark.plans import spl  # noqa: E402,F401
from ilogtail_spark.sinks import serialize  # noqa: E402,F401

__all__ = ["OPERATORS", "register"]
