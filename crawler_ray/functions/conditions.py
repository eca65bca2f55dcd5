"""skip_if / run_only_if condition evaluation.

Mirrors the reference ``ConditionEvaluator``
(``/root/reference/crawler/services/condition_evaluator.py:21-273``) exactly,
including its quirks:

- trailing ``exists`` / ``empty`` / ``!empty`` checks run before operator
  parsing; comparison operators tried in order ==, !=, >=, <=, >, <;
- operand resolution: templates resolve to STRINGS (str substitution), then
  quoted literals strip quotes, numerics parse (int unless '.'), true/false
  parse, else bare string;
- ordering comparisons on mixed types (or dict/list operands) are a
  TypeError -> False; a bare value evaluates truthily with the reference's
  string table ("true", "yes", "1", "success");
- ANY internal error evaluates to False, and the orchestrator's documented
  default on evaluation failure is "run" (step_orchestrator.py:389-444) —
  :func:`should_run` encodes that contract.
"""

from __future__ import annotations

import re
from typing import Any

from crawler_ray.functions.variables import has_variables, resolve

_EXISTS_RE = re.compile(r"\s+exists\s*$")
_EMPTY_RE = re.compile(r"\s+!?empty\s*$")
_NEG_EMPTY_RE = re.compile(r"\s+!empty\s*$")
OPERATORS = ("==", "!=", ">=", "<=", ">", "<")


def _literal(value_str: str, context: dict) -> Any:
    value_str = value_str.strip()
    if has_variables(value_str):
        return resolve(value_str, context)
    if (value_str.startswith('"') and value_str.endswith('"')) or (
        value_str.startswith("'") and value_str.endswith("'")
    ):
        return value_str[1:-1]
    try:
        return float(value_str) if "." in value_str else int(value_str)
    except ValueError:
        pass
    if value_str.lower() in ("true", "false"):
        return value_str.lower() == "true"
    return value_str


def evaluate(condition: str, context: dict) -> bool:
    """Evaluate one condition against the workflow context; errors -> False."""
    try:
        condition = condition.strip()
        if _EXISTS_RE.search(condition):
            ref = _EXISTS_RE.sub("", condition).strip()
            try:
                resolve(ref, context)
                return True
            except ValueError:
                return False
        if _EMPTY_RE.search(condition):
            negated = _NEG_EMPTY_RE.search(condition) is not None
            ref = _EMPTY_RE.sub("", condition).strip()
            try:
                value = _literal(ref, context)
            except ValueError:
                return not negated
            is_empty = (
                len(value) == 0 if isinstance(value, (list, dict, str)) else value is None
            )
            return not is_empty if negated else is_empty
        for op in OPERATORS:
            if op in condition:
                left_s, right_s = condition.split(op, 1)
                left, right = _literal(left_s, context), _literal(right_s, context)
                if op == "==":
                    return left == right
                if op == "!=":
                    return left != right
                if isinstance(left, (dict, list)) or isinstance(right, (dict, list)):
                    return False
                try:
                    if op == ">":
                        return bool(left > right)
                    if op == "<":
                        return bool(left < right)
                    if op == ">=":
                        return bool(left >= right)
                    return bool(left <= right)
                except TypeError:
                    return False
        value = _literal(condition, context)
        if isinstance(value, bool):
            return value
        if isinstance(value, str):
            return value.lower() in ("true", "yes", "1", "success")
        if isinstance(value, (int, float)):
            return value != 0
        if isinstance(value, (list, dict)):
            return len(value) > 0
        return bool(value)
    except Exception:
        return False


def should_run(step_config: dict, context: dict) -> bool:
    """The orchestrator's skip_if / run_only_if contract, mirrored exactly
    (step_orchestrator.py:389-444): when ``skip_if`` is present it alone
    decides (``run_only_if`` is IGNORED — reference returns early); else
    ``run_only_if`` false -> skip.  Evaluation errors yield False from
    :func:`evaluate` (condition_evaluator.py:80-88), which means
    error -> RUN for skip_if but error -> SKIP for run_only_if — a
    reference quirk preserved deliberately."""
    skip_if = step_config.get("skip_if")
    if skip_if:
        return not evaluate(skip_if, context)
    run_only_if = step_config.get("run_only_if")
    if run_only_if:
        return evaluate(run_only_if, context)
    return True
