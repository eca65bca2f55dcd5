"""Workflow-layer scalar functions: variables, conditions, cron."""

from datetime import datetime, timezone

import pytest

from crawler_ray.functions.conditions import evaluate, should_run
from crawler_ray.functions.cron import CronSchedule, calculate_next_run, is_valid_cron
from crawler_ray.functions.variables import resolve, resolve_reference

CTX = {
    "variables": {"city": "jakarta", "count": 5, "flag": True, "blank": ""},
    "steps": {
        "crawl": {"urls": ["https://a", "https://b"], "status": "success",
                  "meta": {"pages": 3}},
        "empty_step": {"items": []},
    },
}


class TestVariables:
    def test_simple(self):
        assert resolve("{{city}}", CTX) == "jakarta"

    def test_str_substitution(self):
        assert resolve("city={{city}}, n={{count}}", CTX) == "city=jakarta, n=5"

    def test_step_paths(self):
        assert resolve_reference("crawl.status", CTX) == "success"
        assert resolve_reference("crawl.urls.1", CTX) == "https://b"
        assert resolve_reference("crawl.meta.pages", CTX) == 3

    def test_nested_containers(self):
        out = resolve({"a": ["{{city}}", {"b": "{{crawl.status}}"}], "n": 7}, CTX)
        assert out == {"a": ["jakarta", {"b": "success"}], "n": 7}

    def test_missing_raises(self):
        with pytest.raises(ValueError):
            resolve("{{nope}}", CTX)
        with pytest.raises(ValueError):
            resolve("{{crawl.nope}}", CTX)

    def test_non_string_passthrough(self):
        assert resolve(42, CTX) == 42


class TestSubstitutionV2:
    POOLS = {
        "variables": {"city": "jakarta", "n": 5, "ref": "${variables.city}"},
        "ENV": {"API_KEY": "sekrit"},
        "input": {"urls": ["https://a", "https://b"]},
        "pagination": {"current_page": 3},
        "metadata": {"job": {"id": "j-1"}},
    }

    def test_sources(self):
        from crawler_ray.functions.variables import substitute_v2 as sub

        assert sub("${variables.city}", self.POOLS) == "jakarta"
        assert sub("${ENV.API_KEY}", self.POOLS) == "sekrit"
        assert sub("${input.urls.1}", self.POOLS) == "https://b"
        assert sub("${pagination.current_page}", self.POOLS) == 3
        assert sub("${metadata.job.id}", self.POOLS) == "j-1"

    def test_type_preserving_single_placeholder(self):
        from crawler_ray.functions.variables import substitute_v2 as sub

        assert sub("${variables.n}", self.POOLS) == 5          # int, not "5"
        assert sub("n=${variables.n}", self.POOLS) == "n=5"    # embedded: str

    def test_escape(self):
        from crawler_ray.functions.variables import substitute_v2 as sub

        assert sub(r"literal \${variables.city}", self.POOLS) == "literal ${variables.city}"

    def test_recursive_and_circular(self):
        from crawler_ray.functions.variables import (
            CircularReference, substitute_v2 as sub,
        )

        assert sub("${variables.ref}", self.POOLS) == "jakarta"
        pools = {"variables": {"a": "${variables.b}", "b": "${variables.a}"}}
        with pytest.raises(CircularReference):
            sub("${variables.a}", pools)

    def test_strict_vs_lenient(self):
        from crawler_ray.functions.variables import (
            VariableNotFound, substitute_v2 as sub,
        )

        with pytest.raises(VariableNotFound):
            sub("${variables.nope}", self.POOLS)
        assert sub("x${variables.nope}y", self.POOLS, strict=False) == "xy"

    def test_env_fallback_to_os(self, monkeypatch):
        from crawler_ray.functions.variables import substitute_v2 as sub

        monkeypatch.setenv("MW_TEST_VAR", "fromos")
        assert sub("${ENV.MW_TEST_VAR}", self.POOLS) == "fromos"

    def test_containers(self):
        from crawler_ray.functions.variables import substitute_v2 as sub

        out = sub({"k": ["${variables.city}", {"n": "${variables.n}"}]}, self.POOLS)
        assert out == {"k": ["jakarta", {"n": 5}]}


class TestConditions:
    def test_equality(self):
        assert evaluate("{{crawl.status}} == 'success'", CTX)
        assert evaluate("{{crawl.status}} != 'failed'", CTX)
        assert not evaluate("{{crawl.status}} == 'failed'", CTX)

    def test_numeric_comparison(self):
        assert evaluate("3 > 2", CTX)
        assert evaluate("2.5 <= 2.5", CTX)
        # reference quirk: template operands resolve to STRINGS, so
        # str-vs-int ordering is a TypeError -> False
        assert not evaluate("{{count}} > 2", CTX)
        # but string equality against a quoted literal works
        assert evaluate("{{count}} == '5'", CTX)

    def test_exists(self):
        assert evaluate("{{crawl.status}} exists", CTX)
        assert not evaluate("{{crawl.missing}} exists", CTX)

    def test_empty(self):
        # reference quirk: template operands stringify, so an empty LIST
        # renders "[]" (len 2, not empty); only empty STRINGS test empty
        # (condition_evaluator.py:160-186 via variable_resolver.resolve)
        assert not evaluate("{{empty_step.items}} empty", CTX)
        assert evaluate("{{blank}} empty", CTX)
        assert not evaluate("{{crawl.urls}} empty", CTX)
        assert evaluate("{{crawl.urls}} !empty", CTX)
        # unresolvable reference -> empty=True, !empty=False
        assert evaluate("{{nope.x}} empty", CTX)
        assert not evaluate("{{nope.x}} !empty", CTX)

    def test_bare_truthiness(self):
        assert evaluate("true", CTX)
        assert not evaluate("false", CTX)
        assert evaluate("{{crawl.status}}", CTX)  # 'success' is truthy

    def test_errors_default_false(self):
        assert not evaluate("{{nope.nope}} == 1", CTX)

    def test_should_run_contract(self):
        assert should_run({}, CTX)
        assert not should_run({"skip_if": "{{crawl.status}} == 'success'"}, CTX)
        assert should_run({"skip_if": "{{crawl.status}} == 'failed'"}, CTX)
        assert should_run({"run_only_if": "{{crawl.urls}} !empty"}, CTX)
        assert not should_run({"run_only_if": "{{crawl.urls}} empty"}, CTX)
        # reference quirks (step_orchestrator.py:389-444): evaluation errors
        # yield False -> run for skip_if, SKIP for run_only_if; and a present
        # skip_if short-circuits (run_only_if ignored)
        assert should_run({"skip_if": "{{missing.x}} == 1"}, CTX)
        assert not should_run({"run_only_if": "{{missing.x}} == 1"}, CTX)
        assert should_run(
            {"skip_if": "{{crawl.status}} == 'failed'",
             "run_only_if": "{{crawl.urls}} empty"},  # ignored
            CTX,
        )


class TestCron:
    def test_validity(self):
        assert is_valid_cron("*/5 * * * *")
        assert is_valid_cron("0 9 * * 1-5")
        assert not is_valid_cron("bad")
        assert not is_valid_cron("61 * * * *")
        assert not is_valid_cron("* * * *")

    def test_every_five_minutes(self):
        now = datetime(2026, 8, 17, 10, 2, tzinfo=timezone.utc)
        assert calculate_next_run("*/5 * * * *", now) == datetime(
            2026, 8, 17, 10, 5, tzinfo=timezone.utc
        )

    def test_daily_9am(self):
        now = datetime(2026, 8, 17, 10, 0, tzinfo=timezone.utc)
        assert calculate_next_run("0 9 * * *", now) == datetime(
            2026, 8, 18, 9, 0, tzinfo=timezone.utc
        )

    def test_weekday_only(self):
        # 2026-08-14 is a Friday; next weekday 9am after Friday 10:00 is Monday
        now = datetime(2026, 8, 14, 10, 0, tzinfo=timezone.utc)
        nxt = calculate_next_run("0 9 * * 1-5", now)
        assert nxt == datetime(2026, 8, 17, 9, 0, tzinfo=timezone.utc)

    def test_strictly_after(self):
        now = datetime(2026, 8, 17, 9, 0, tzinfo=timezone.utc)
        assert calculate_next_run("0 9 * * *", now).day == 18

    def test_dom_dow_either(self):
        # POSIX: both restricted -> either may match; the 1st OR a Sunday
        s = CronSchedule("0 0 1 * 0")
        assert s.matches(datetime(2026, 9, 1, 0, 0))   # 1st (a Tuesday)
        assert s.matches(datetime(2026, 8, 23, 0, 0))  # a Sunday, not the 1st
        assert not s.matches(datetime(2026, 8, 18, 0, 0))

    def test_sunday_as_seven(self):
        s = CronSchedule("0 0 * * 7")
        assert s.matches(datetime(2026, 8, 23, 0, 0))  # Sunday
