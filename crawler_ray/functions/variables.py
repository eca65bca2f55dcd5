"""Template-variable resolution over a workflow context.

Mirrors the reference ``VariableResolver``
(``/root/reference/crawler/services/variable_resolver.py:18-206``):

- ``{{name}}`` looks up a context variable; ``{{step.field.nested.0}}``
  navigates a step result with dot-paths incl. numeric list indices;
- string templates get placeholder-by-placeholder ``str()`` substitution
  (so a template that IS one placeholder still yields a string — reference
  behavior, resolver.resolve:46-76);
- dicts/lists resolve recursively; non-strings pass through;
- unknown references raise ``ValueError``.

The context here is a plain dict ``{"variables": {...}, "steps": {...}}`` —
the engine threads it between pipeline rounds (driver-side only; never a
data-plane operation, SURVEY.md M8).
"""

from __future__ import annotations

import re
from typing import Any

VAR_RE = re.compile(r"\{\{([^}]+)\}\}")


def has_variables(template: Any) -> bool:
    return isinstance(template, str) and bool(VAR_RE.search(template))


def _navigate(value: Any, segments: list[str], reference: str) -> Any:
    for seg in segments:
        if isinstance(value, dict):
            if seg not in value:
                raise ValueError(f"Field '{seg}' not found in reference '{reference}'")
            value = value[seg]
        elif isinstance(value, list):
            try:
                value = value[int(seg)]
            except (ValueError, IndexError) as e:
                raise ValueError(f"Bad list index '{seg}' in '{reference}'") from e
        else:
            raise ValueError(f"Cannot navigate into {type(value).__name__} at '{seg}'")
    return value


def resolve_reference(reference: str, context: dict) -> Any:
    """One dotted reference -> raw value (ValueError when missing)."""
    parts = reference.split(".")
    variables = context.get("variables", {})
    steps = context.get("steps", {})
    if len(parts) == 1:
        if parts[0] in variables:
            return variables[parts[0]]
        if parts[0] in steps:
            return steps[parts[0]]
        raise ValueError(f"Variable '{reference}' not found")
    head = parts[0]
    if head in steps:
        return _navigate(steps[head], parts[1:], reference)
    if head in variables:
        return _navigate(variables[head], parts[1:], reference)
    raise ValueError(f"Reference '{reference}' not found")


def resolve(template: Any, context: dict) -> Any:
    """Resolve every ``{{ref}}`` in a string (str() substitution); dicts and
    lists recurse; other types pass through."""
    if isinstance(template, dict):
        return {k: resolve(v, context) for k, v in template.items()}
    if isinstance(template, list):
        return [resolve(v, context) for v in template]
    if not isinstance(template, str):
        return template
    out = template
    for match in VAR_RE.findall(template):
        out = out.replace("{{%s}}" % match, str(resolve_reference(match.strip(), context)))
    return out


# ---------------------------------------------------------------------------
# v2 substitution: ${source.path} with pluggable providers
# (reference ``crawler/utils/variable_substitution.py:33-781``: sources
# variables / ENV / input / pagination / metadata, backslash escapes,
# recursive resolution with circular-reference detection, strict/lenient
# missing-variable handling)
# ---------------------------------------------------------------------------

V2_RE = re.compile(r"\$\{(?P<source>\w+)(?:\.(?P<path>[^}]*))?\}")
V2_ESCAPE_RE = re.compile(r"\\\$\{([^}]+)\}")
MAX_RECURSION = 10


class VariableNotFound(KeyError):
    pass


class CircularReference(ValueError):
    pass


DEFAULT_PROVIDERS = ("variables", "ENV", "input", "pagination", "metadata")


def _provider_lookup(source: str, path: str, pools: dict) -> Any:
    if source == "ENV":
        import os

        pool = {**os.environ, **pools.get("ENV", {})}
        if path in pool:
            return pool[path]
        raise VariableNotFound(f"ENV.{path}")
    pool = pools.get(source)
    if pool is None:
        raise VariableNotFound(source)
    if not path:
        return pool
    value = pool
    for seg in path.split("."):
        if isinstance(value, dict) and seg in value:
            value = value[seg]
        elif isinstance(value, list):
            try:
                value = value[int(seg)]
            except (ValueError, IndexError) as e:
                raise VariableNotFound(f"{source}.{path}") from e
        else:
            raise VariableNotFound(f"{source}.{path}")
    return value


def substitute_v2(
    text: Any,
    pools: dict,
    strict: bool = True,
    _depth: int = 0,
    _seen: frozenset = frozenset(),
) -> Any:
    """Resolve ``${source.path}`` placeholders with provider pools
    ({"variables": ..., "ENV": ..., "input": ..., "pagination": ...,
    "metadata": ...}).

    - ``\\${...}`` escapes to a literal ``${...}``;
    - a template that is exactly one placeholder returns the RAW value
      (type-preserving, unlike the v1 ``{{}}`` system);
    - resolved string values are re-resolved (recursion) with circular
      detection and a depth cap of 10;
    - strict=False turns missing variables into empty strings.
    """
    if isinstance(text, dict):
        return {k: substitute_v2(v, pools, strict) for k, v in text.items()}
    if isinstance(text, list):
        return [substitute_v2(v, pools, strict) for v in text]
    if not isinstance(text, str):
        return text
    if _depth > MAX_RECURSION:
        raise CircularReference(f"max recursion depth exceeded in {text!r}")

    escapes: list[str] = []

    def hold_escape(m):
        escapes.append(m.group(1))
        return f"\x00ESC{len(escapes) - 1}\x00"

    work = V2_ESCAPE_RE.sub(hold_escape, text)

    def lookup(m) -> Any:
        key = m.group(0)
        if key in _seen:
            raise CircularReference(f"circular reference: {key}")
        try:
            value = _provider_lookup(m.group("source"), m.group("path") or "", pools)
        except VariableNotFound:
            if strict:
                raise
            return ""
        if isinstance(value, str) and V2_RE.search(value):
            value = substitute_v2(value, pools, strict, _depth + 1, _seen | {key})
        return value

    whole = V2_RE.fullmatch(work)
    if whole and not escapes:
        return lookup(whole)  # single-placeholder: preserve the value type

    out = V2_RE.sub(lambda m: str(lookup(m)), work)
    for i, esc in enumerate(escapes):
        out = out.replace(f"\x00ESC{i}\x00", "${%s}" % esc)
    return out
