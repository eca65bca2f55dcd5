"""Step input/output validation (reference M11,
``/root/reference/crawler/services/step_validator.py:41-360``).

The reference validates with pydantic schemas per step type; this is the
same contract hand-rolled (no pydantic in the sandbox), with identical
error messages where tests assert on them:

- crawl input: one URL string or a list whose FIRST element is the seed
  (CrawlStepInput, step_validator.py:41-72);
- scrape input: a URL string or list of URL strings, every element checked
  (ScrapeStepInput, step_validator.py:75-107);
- crawl output: extracted_data non-empty dict + metadata dict
  (CrawlStepOutput, step_validator.py:113-143);
- scrape output: extracted_data dict, ``items`` must be a list when
  present, metadata counters non-negative ints when present
  (ScrapeStepOutput, step_validator.py:146-184);
- ``StepValidationError`` carries (step_name, errors, validation_type) and
  the same formatted message (step_validator.py:18-33).

Ray-native addition: :func:`partition_valid_urls` is the QUARANTINE path —
instead of failing a whole distributed scrape because one row is bad, the
caller splits the url list into (valid, quarantined) and runs the valid
side, reporting quarantined rows in the step output.
"""

from __future__ import annotations

from typing import Any


class StepValidationError(ValueError):
    """step_validator.py:18-33 (message format preserved)."""

    def __init__(self, step_name: str, errors: list[str],
                 validation_type: str = "input") -> None:
        self.step_name = step_name
        self.errors = errors
        self.validation_type = validation_type
        error_list = "; ".join(errors)
        super().__init__(
            f"Step '{step_name}' {validation_type} validation failed: {error_list}"
        )


# ------------------------------------------------------------------ inputs
def _crawl_input_errors(data: Any) -> list[str]:
    if isinstance(data, str):
        if not data.strip():
            return ["URL cannot be empty string"]
        return []
    if isinstance(data, list):
        if len(data) == 0:
            return ["URL list cannot be empty"]
        if not isinstance(data[0], str):
            return ["First URL in list must be a string"]
        if not data[0].strip():
            return ["First URL in list cannot be empty string"]
        return []
    return [f"URL must be a string or list, got {type(data).__name__}"]


def _scrape_input_errors(data: Any) -> list[str]:
    if isinstance(data, str):
        if not data.strip():
            return ["URL cannot be empty string"]
        return []
    if isinstance(data, list):
        if len(data) == 0:
            return ["URL list cannot be empty"]
        errors = []
        for i, url in enumerate(data):
            if not isinstance(url, str):
                errors.append(
                    f"URL at index {i} must be a string, got {type(url).__name__}"
                )
            elif not url.strip():
                errors.append(f"URL at index {i} cannot be empty string")
        return errors
    return [f"URLs must be a string or list, got {type(data).__name__}"]


def _selector_errors(selectors: Any) -> list[str]:
    """Selector-spec shape validation: a selector is a non-empty string or
    a dict whose 'selector' is a non-empty string (selector shapes accepted
    by the reference SelectorProcessor)."""
    if selectors is None:
        return []
    if not isinstance(selectors, dict):
        return [f"Selectors must be a dictionary, got {type(selectors).__name__}"]
    errors = []
    for name, spec in selectors.items():
        if isinstance(spec, str):
            if not spec.strip():
                errors.append(f"Selector '{name}' cannot be empty string")
        elif isinstance(spec, dict):
            sel = spec.get("selector")
            if not isinstance(sel, str) or not sel.strip():
                errors.append(
                    f"Selector '{name}' must have a non-empty 'selector' string"
                )
        else:
            errors.append(
                f"Selector '{name}' must be a string or dict, got {type(spec).__name__}"
            )
    return errors


# ----------------------------------------------------------------- outputs
def _crawl_output_errors(extracted_data: Any, metadata: Any) -> list[str]:
    errors = []
    if not isinstance(extracted_data, dict):
        errors.append("Extracted data must be a dictionary")
    elif not extracted_data:
        errors.append("Crawl step must extract at least one field")
    if metadata is not None and not isinstance(metadata, dict):
        errors.append("Metadata must be a dictionary")
    return errors


def _scrape_output_errors(extracted_data: Any, metadata: Any) -> list[str]:
    errors = []
    if not isinstance(extracted_data, dict):
        errors.append("Extracted data must be a dictionary")
    elif "items" in extracted_data and not isinstance(extracted_data["items"], list):
        errors.append("'items' field must be a list")
    if isinstance(metadata, dict):
        expected = {"total_urls", "successful_urls", "failed_urls"}
        if expected.issubset(metadata.keys()):
            for f in sorted(expected):
                v = metadata[f]
                if not isinstance(v, int) or isinstance(v, bool) or v < 0:
                    errors.append(
                        f"Metadata field '{f}' must be a non-negative integer"
                    )
    elif metadata is not None:
        errors.append("Metadata must be a dictionary")
    return errors


class StepValidator:
    """step_validator.py:191-360 — validate_input / validate_output with a
    strict flag (strict=False logs-and-continues in the reference; here it
    returns the error list instead of raising)."""

    def validate_input(self, step_name: str, step_type: str, input_data: Any,
                       selectors: Any = None, strict: bool = True) -> list[str]:
        if input_data is None:
            errors = []  # caller pre-partitioned the urls (quarantine mode)
        elif step_type == "crawl":
            errors = _crawl_input_errors(input_data)
        elif step_type == "scrape":
            errors = _scrape_input_errors(input_data)
        else:
            errors = []  # unsupported type: validation skipped (ref :237-246)
        errors = errors + _selector_errors(selectors)
        if errors and strict:
            raise StepValidationError(step_name, errors, "input")
        return errors

    def validate_output(self, step_name: str, step_type: str,
                        extracted_data: Any, metadata: Any = None,
                        strict: bool = True) -> list[str]:
        if step_type == "crawl":
            errors = _crawl_output_errors(extracted_data, metadata)
        elif step_type == "scrape":
            errors = _scrape_output_errors(extracted_data, metadata)
        else:
            errors = []
        if errors and strict:
            raise StepValidationError(step_name, errors, "output")
        return errors


def partition_valid_urls(urls: Any) -> tuple[list[str], list[dict]]:
    """Quarantine split: (valid urls, quarantined rows).  Each quarantined
    row records the index, offending value and reason — the Ray-native
    alternative to failing the whole step on one bad row."""
    if isinstance(urls, str):
        urls = [urls]
    if not isinstance(urls, list):
        return [], [{"index": 0, "value": repr(urls),
                     "reason": f"URLs must be a string or list, got {type(urls).__name__}"}]
    valid, quarantined = [], []
    for i, u in enumerate(urls):
        if not isinstance(u, str):
            quarantined.append(
                {"index": i, "value": repr(u),
                 "reason": f"URL at index {i} must be a string, got {type(u).__name__}"}
            )
        elif not u.strip():
            quarantined.append(
                {"index": i, "value": u,
                 "reason": f"URL at index {i} cannot be empty string"}
            )
        else:
            valid.append(u)
    return valid, quarantined
