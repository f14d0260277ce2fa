"""Grok pattern compiler.

The reference ships a 77-entry grok pattern library and expands
``%{NAME:alias}`` references recursively into one regex, then matches
patterns in order with a timeout
(plugins/processor/grok/processor_grok.go:41-46,55,147-192,
processor_grok_default_patterns.go). We reproduce the public grok
dialect: expansion happens ONCE at the driver (pure Python), the
compiled regex then runs JVM-side via parse_regex — grok never costs
a UDF.

Pattern definitions below are the standard public grok idioms
(logstash-patterns-core, Apache-2.0 public corpus), restricted to
constructs valid in Java, RE2 and Python dialects.
"""

from __future__ import annotations

import re

DEFAULT_PATTERNS: dict[str, str] = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "BASE10NUM": r"[+-]?(?:\d+(?:\.\d+)?|\.\d+)",
    "POSINT": r"\b[1-9]\d*\b",
    "NONNEGINT": r"\b\d+\b",
    "QUOTEDSTRING": r"\"[^\"]*\"|'[^']*'",
    "UUID": r"[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    "IPV4": (
        r"(?:25[0-5]|2[0-4]\d|[01]?\d?\d)(?:\.(?:25[0-5]|2[0-4]\d|[01]?\d?\d)){3}"
    ),
    "IP": r"(?:25[0-5]|2[0-4]\d|[01]?\d?\d)(?:\.(?:25[0-5]|2[0-4]\d|[01]?\d?\d)){3}",
    "HOSTNAME": r"\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?\b",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"[a-zA-Z0-9._-]+",
    "EMAILADDRESS": r"[a-zA-Z][a-zA-Z0-9_.+-=:]+@[0-9A-Za-z][0-9A-Za-z-]*(?:\.[0-9A-Za-z][0-9A-Za-z-]*)+",
    "URIPATH": r"(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%&_\-]*)+",
    "URIPARAM": r"\?[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\-\[\]<>]*",
    "URIPATHPARAM": r"(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%&_\-]*)+(?:\?[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\-\[\]<>]*)?",
    "MONTHDAY": r"(?:0[1-9]|[12]\d|3[01]|[1-9])",
    "YEAR": r"(?:\d\d){1,2}",
    "HOUR": r"(?:2[0123]|[01]?\d)",
    "MINUTE": r"(?:[0-5]\d)",
    "SECOND": r"(?:[0-5]\d)(?:\.\d+)?",
    "TIME": r"(?:2[0123]|[01]?\d):(?:[0-5]\d)(?:::?(?:[0-5]\d)(?:\.\d+)?)?",
    "TIMESTAMP_ISO8601": (
        r"(?:\d\d){1,2}-(?:0?[1-9]|1[0-2])-(?:0[1-9]|[12]\d|3[01]|[1-9])"
        r"[T ](?:2[0123]|[01]?\d):?(?:[0-5]\d)(?::?(?:[0-5]\d)(?:\.\d+)?)?"
        r"(?:Z|[+-](?:2[0123]|[01]?\d)(?::?(?:[0-5]\d)))?"
    ),
    "LOGLEVEL": (
        r"[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|"
        r"[Ii]nfo|INFO|[Ww]arn(?:ing)?|WARN(?:ING)?|[Ee]rr(?:or)?|ERR(?:OR)?|"
        r"[Cc]rit(?:ical)?|CRIT(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE"
    ),
}

_REF = re.compile(r"%\{(\w+)(?::([\w\[\]@.]+))?(?::(int|float|long))?\}")

MAX_EXPANSION_DEPTH = 10


class GrokError(ValueError):
    pass


def compile_grok(
    pattern: str, custom_patterns: dict[str, str] | None = None
) -> tuple[str, list[str], dict[str, str]]:
    """Expand a grok expression into (regex, ordered field names,
    field->cast-type map). ``%{NAME}`` without alias expands inline
    without capturing (matching the Go plugin's semantics of only
    emitting aliased fields)."""
    library = dict(DEFAULT_PATTERNS)
    if custom_patterns:
        library.update(custom_patterns)

    fields: list[str] = []
    types: dict[str, str] = {}

    def expand(pat: str, depth: int) -> str:
        if depth > MAX_EXPANSION_DEPTH:
            raise GrokError(f"grok expansion too deep in {pattern!r}")

        def sub(m: re.Match) -> str:
            name, alias, cast = m.group(1), m.group(2), m.group(3)
            if name not in library:
                raise GrokError(f"unknown grok pattern %{{{name}}}")
            body = expand(library[name], depth + 1)
            if alias:
                fields.append(alias)
                if cast:
                    types[alias] = "double" if cast == "float" else cast
                return f"({body})"
            return f"(?:{body})"

        return _REF.sub(sub, pat)

    regex = expand(pattern, 0)
    return regex, fields, types


def grok_parse(
    df,
    pattern: str,
    source: str = "text",
    custom_patterns: dict[str, str] | None = None,
    options=None,
    engine: str = "native",
):
    """processor_grok as a DataFrame transform: compile at the driver,
    execute with parse_regex (JVM) or parse_regex_pandas (Arrow)."""
    from ilogtail_spark.operators.parse import parse_regex, parse_regex_pandas

    regex, fields, types = compile_grok(pattern, custom_patterns)
    # aliased captures are numbered in order of appearance; nested
    # non-capturing groups don't shift numbering because expansion
    # only emits (?:...) for unaliased refs
    fn = parse_regex if engine == "native" else parse_regex_pandas
    return fn(df, regex, fields, source=source, types=types, options=options)


from ilogtail_spark.operators.registry import register  # noqa: E402


@register("processor_grok")
def _grok_factory(**cfg):
    """processor_grok (processor_grok.go:41-55,147-192): Match takes
    an ordered list of grok expressions; first success wins. We apply
    the first pattern (multi-pattern chains compose via
    fields_with_condition in config)."""
    patterns = cfg.get("Match", cfg.get("patterns"))
    pattern = patterns[0] if isinstance(patterns, list) else patterns
    return lambda df: grok_parse(
        df,
        pattern,
        source=cfg.get("SourceKey", cfg.get("source", "text")),
        custom_patterns=cfg.get("CustomPatterns", cfg.get("custom_patterns")),
    )
