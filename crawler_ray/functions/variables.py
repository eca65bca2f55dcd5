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
