"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship crawl pipeline (round-based URL frontier over
the deterministic mini-web sized from sf0.001, politeness budget, sharded
seen set, dedup marking) and returns the interleaved-span documents Dataset
(BASELINE.json input_hint schema: doc_id + spans list<struct<kind, text,
media_ref, offset>> plus provenance/dedup columns).

``queries()`` / ``oracle_sql()`` expose one entry per implemented operator
family from SURVEY.md §2 (see crawler_ray/pipelines/queries.py).  Ray is
initialised by the caller; nothing here calls ray.init().
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
# Ray workers resolve modules via the driver's cwd; make the package
# importable even when the driver was launched elsewhere.
os.environ.setdefault("PYTHONPATH", _REPO)


def entry() -> Any:
    import pyarrow as pa
    import pyarrow.compute as pc

    from crawler_ray.pipelines.crawl import CrawlEngine
    from crawler_ray.sources.miniweb import MiniWeb
    from crawler_ray.stages.dedupe import mark_duplicates

    # fixed 300-doc mini-web (the same web the crawl conformance oracle
    # embeds; the sf dir only feeds the relational queries)
    web = MiniWeb(n_docs=300)
    engine = CrawlEngine(web, budget_per_host=32, max_rounds=48, seen_shards=2)
    result = engine.run()
    marked = mark_duplicates(result.pages)

    def to_documents(t: "pa.Table") -> "pa.Table":
        return pa.table(
            {
                "doc_id": t["url_hash"],
                "url": t["url"],
                "host": t["host"],
                "round": t["round"],
                "title": t["title"],
                "spans": t["spans"],
                "n_spans": pc.list_value_length(t["spans"]),
                "content_hash": t["content_hash"],
                "simhash": t["simhash"],
                "is_duplicate": t["is_duplicate"],
                "duplicate_of": t["duplicate_of"],
                "similarity_score": t["similarity_score"],
            }
        )

    return marked.map_batches(to_documents, batch_format="pyarrow")


def queries() -> dict[str, Callable[[str], Any]]:
    from crawler_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from crawler_ray.pipelines import queries as q

    return q.oracle_sql()
