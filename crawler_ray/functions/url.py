"""URL canonicalization and hashing kernels.

Semantics match the reference implementation exactly (see
``/root/reference/crawler/utils/url.py:78-269`` and its unit tests at
``/root/reference/tests/unit/utils/test_url.py``):

- strip leading/trailing whitespace, require scheme + netloc;
- lowercase scheme and netloc, preserve path case;
- drop the fragment;
- drop tracking query params (45-name denylist) unless they are also in the
  semantic allowlist (22 names) or caller-supplied ``preserve_params``;
- first value wins for repeated params, blank values kept;
- params sorted by name and re-encoded with ``urlencode`` (quote_plus rules);
- ``url_hash`` = sha256(normalized_url) lowercase hex (64 chars).

The batch entry points (:func:`normalize_url_batch`,
:func:`normalize_and_hash_batch`) are the hot path used inside
``Dataset.map_batches``; they never raise on bad rows — invalid URLs yield
``None`` so the pipeline can quarantine them with a vectorized filter instead
of a per-row try/except at the call site.
"""

from __future__ import annotations

import hashlib
from urllib.parse import parse_qs, urlencode, urlparse, urlunparse

# Query-parameter names injected by analytics / ad platforms; never part of
# page identity.  Values mirror /root/reference/crawler/utils/url.py:8-49.
TRACKING_PARAMS: frozenset[str] = frozenset(
    {
        "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
        "utm_id", "utm_source_platform", "utm_creative_format",
        "utm_marketing_tactic",
        "fbclid", "fb_action_ids", "fb_action_types", "fb_source", "fb_ref",
        "gclid", "gclsrc", "dclid",
        "msclkid",
        "twclid",
        "ttclid",
        "li_fat_id",
        "mc_cid", "mc_eid",
        "_hsenc", "_hsmi",
        "ref", "referrer", "source", "campaign", "medium",
    }
)

# Query-parameter names that carry page identity; always kept.
# Mirrors /root/reference/crawler/utils/url.py:52-75.
SEMANTIC_PARAMS: frozenset[str] = frozenset(
    {
        "page", "p", "category", "cat", "id", "item", "product", "search",
        "q", "query", "sort", "order", "filter", "limit", "offset", "lang",
        "locale", "size", "color", "variant", "tab", "section",
    }
)


def normalize_url(
    url: str,
    *,
    remove_fragment: bool = True,
    remove_tracking: bool = True,
    sort_params: bool = True,
    lowercase_scheme_host: bool = True,
    preserve_params: set[str] | None = None,
) -> str:
    """Canonicalize one URL; raises ``ValueError`` on malformed input.

    Scalar conformance twin of reference ``normalize_url``
    (``/root/reference/crawler/utils/url.py:78-178``).
    """
    if not url or not isinstance(url, str):
        raise ValueError("URL must be a non-empty string")
    parts = urlparse(url.strip())
    if not parts.scheme or not parts.netloc:
        raise ValueError(f"URL must have a scheme and hostname: {url}")

    scheme = parts.scheme.lower() if lowercase_scheme_host else parts.scheme
    netloc = parts.netloc.lower() if lowercase_scheme_host else parts.netloc

    query = ""
    if parts.query:
        keep = SEMANTIC_PARAMS if preserve_params is None else (SEMANTIC_PARAMS | preserve_params)
        multi = parse_qs(parts.query, keep_blank_values=True)
        pairs = []
        for name, values in multi.items():
            if remove_tracking and name in TRACKING_PARAMS and name not in keep:
                continue
            pairs.append((name, values[0]))  # first value wins for repeats
        if sort_params:
            pairs.sort()
        query = urlencode(pairs, doseq=False)

    fragment = "" if remove_fragment else parts.fragment
    return urlunparse((scheme, netloc, parts.path, parts.params, query, fragment))


def hash_url(url: str, normalize: bool = True, **kwargs) -> str:
    """sha256 hex of the (optionally normalized) URL.

    Reference: ``/root/reference/crawler/utils/url.py:207-238``.
    """
    if normalize:
        url = normalize_url(url, **kwargs)
    return hashlib.sha256(url.encode("utf-8")).hexdigest()


def normalize_and_hash(url: str, **kwargs) -> tuple[str, str]:
    """(normalized_url, sha256 hex) in one call.

    Reference: ``/root/reference/crawler/utils/url.py:241-269``.
    """
    norm = normalize_url(url, **kwargs)
    return norm, hashlib.sha256(norm.encode("utf-8")).hexdigest()


def are_urls_equivalent(a: str, b: str, **kwargs) -> bool:
    """True when two URLs canonicalize identically; False on invalid input.

    Reference: ``/root/reference/crawler/utils/url.py:181-204``.
    """
    try:
        return normalize_url(a, **kwargs) == normalize_url(b, **kwargs)
    except ValueError:
        return False


def host_of(url: str) -> str:
    """Lowercased netloc of a URL ('' when unparseable)."""
    try:
        return urlparse(url).netloc.lower()
    except ValueError:
        return ""


# ---------------------------------------------------------------------------
# batch kernels (map_batches hot path)
# ---------------------------------------------------------------------------

def normalize_url_batch(urls: list[str | None]) -> list[str | None]:
    """Canonicalize a batch; invalid/None rows map to None (no exceptions)."""
    out: list[str | None] = []
    for u in urls:
        if not u:
            out.append(None)
            continue
        try:
            out.append(normalize_url(u))
        except ValueError:
            out.append(None)
    return out


def normalize_and_hash_batch(
    urls: list[str | None],
) -> tuple[list[str | None], list[str | None], list[str]]:
    """Batch canonicalize + hash.

    Returns (normalized, url_hash, host) lists; invalid rows get None/None/''.
    sha256 over a batch of short strings is dominated by Python-call overhead
    either way; one tight loop here keeps each map_batches task at C speed
    for the hashing itself.
    """
    sha = hashlib.sha256
    norm_out: list[str | None] = []
    hash_out: list[str | None] = []
    host_out: list[str] = []
    for u in urls:
        if not u:
            norm_out.append(None)
            hash_out.append(None)
            host_out.append("")
            continue
        try:
            parts = urlparse(u.strip())
        except ValueError:
            parts = None
        if parts is None or not parts.scheme or not parts.netloc:
            norm_out.append(None)
            hash_out.append(None)
            host_out.append("")
            continue
        try:
            n = normalize_url(u)
        except ValueError:
            norm_out.append(None)
            hash_out.append(None)
            host_out.append("")
            continue
        norm_out.append(n)
        hash_out.append(sha(n.encode("utf-8")).hexdigest())
        host_out.append(parts.netloc.lower())
    return norm_out, hash_out, host_out
