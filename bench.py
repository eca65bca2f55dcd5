"""Benchmark driver: headline crawl pipeline + representative queries.

Usage:
    python bench.py               # one JSON line: headline + per-query secs
    python bench.py --scaling     # run at 8 and 32 CPUs in fresh processes,
                                  # report both + scaling efficiency

Env:
    GRAFT_SF_DIR   input scale dir (default /root/testdata/sf0.1)
    RAY_GRAFT_CPUS num_cpus for ray.init (default 32)

The headline pipeline is the flagship crawl (BASELINE.json metric: frontier
URLs/sec + pages fetched+parsed/sec under a fixed politeness budget) over the
deterministic mini-web sized from the sf documents table (seed=42).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
os.environ.setdefault("PYTHONPATH", REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# In-flight requests per fetch worker: a wave of C requests overlaps its
# network latency inside the fetch task — the Ray analogue of the
# reference's 30 async HTTP clients on one asyncio loop (PRD.md
# MAX_HTTP_WORKERS=30).  Politeness stays budget/window-enforced.
# The HEADLINE stays at 1 connection: the metric (and its round-over-round
# comparability, and the two-parallelism scaling criterion) is defined on
# the network-bound regime where wall = politeness-budgeted RTTs / fetch
# capacity.  With conns > 1 this tiny 9-round bench becomes bound by the
# ~1-2 s/round orchestration floor instead (a floor that amortizes away on
# real multi-minute rounds) — measured separately in BASELINE.md.
FETCH_CONNS = int(os.environ.get("GRAFT_FETCH_CONNS", "1"))

BENCH_QUERIES = [
    "pricing_summary",
    "events_hourly_window",
    "doc_exact_dedup",
    "doc_source_stats",
    "doc_quality",
    # exact jaccard (doc_jaccard_pairs) is intentionally absent: even with
    # the Vernica prefix filter it pays the full prefix-posting self-merge
    # (measured 39 s at sf0.1, r5; was 323 s pre-prefix-filter) —
    # doc_minhash_pairs is the scale path for the same answer (~3 s)
    "doc_minhash_pairs",
    # near-dup pairs resolved into duplicate CLUSTERS (connected components
    # via one-task union-find below 2M edges, iterative hash-min label
    # propagation beyond)
    "doc_dup_clusters",
    "doc_simhash_bands",
    "knn_bruteforce",
    "emb_similar_pairs",
    "lineitem_quantiles",
    "price_quantiles_sketch",
    "doc_sample",
    # full-corpus embedding near-dup: timed since the hybrid verify landed
    # (r3 VERDICT follow-up).  Note this corpus' 0.35 pair threshold is
    # WEAK similarity, where banding admits ~60% of all pairs — honest-poor
    # pruning, documented in the query's docstring; the planted-cluster
    # pruning showcase is tests/test_ann_pruning.py.
    "emb_lsh_pairs",
    # interval/range join: one-shuffle (key, epoch) partitioning — the
    # trailing-window count over 100k events (see stages/join.py)
    "events_range_join",
    # exact 2-pass heavy hitters (Misra-Gries candidates + exact recount)
    "doc_heavy_tokens",
    # TF-IDF top terms (batch-local TF + broadcast-or-join IDF)
    "doc_tfidf_top_terms",
    # streaming k-means assignment against broadcast trained centroids
    "emb_kmeans_assign",
    # hopping-window aggregate (each event expands to its K covering
    # windows inside the batch; shuffle carries one row per key/window/block)
    "events_sliding_window",
    # bloom-prefiltered exact anti-join: misses bypass the exchange
    "customer_no_events",
    # 4-iteration PageRank: per-iteration partitioned join + groupby sum,
    # ranks materialized between iterations (no lineage replay)
    "graph_pagerank",
    # analytic window functions (row_number / lag / running sum) over
    # hash-bucketed keys
    "events_window_rank",
    # long-to-wide pivot with the conditional aggregation inside the
    # per-batch partial
    "events_pivot",
    # A-ES weighted sampling without replacement (deterministic race keys)
    "lineitem_weighted_sample",
    # BM25 ranked retrieval (two streaming passes + broadcast scalars)
    "doc_bm25_topk",
    # span-level (paragraph-style) boilerplate dedup over the interleaved
    # span table: synthesize list<struct> spans, flatten, two bucketed
    # exchanges (span x source, then span) — no broadcast, no driver state
    "span_boilerplate",
    # stateless zero-shuffle Arrow cleaning map (NFC + whitespace collapse)
    "doc_clean",
    # corpus-quantile filter: bounded histogram -> broadcast threshold
    "doc_topq_filter",
    # staged-conversion funnel (user-bucketed; non-funnel types filtered
    # pre-shuffle).  doc_triangles is intentionally absent: it re-runs the
    # exact jaccard join (~28 s at sf0.1, excluded for the same reason as
    # doc_jaccard_pairs itself)
    "events_funnel",
    # fuzzy edit-distance self-join: distinct-first + length bands +
    # segment (PassJoin) candidate filter instead of per-band all-pairs
    "part_fuzzy_pairs",
    # corpus-prep composite: echo -> gate -> exact dedup -> split, one
    # content-hash combine total (the text itself never shuffles)
    "prepare_corpus",
    # token-budget sequence packing via the distributed prefix scan
    "doc_pack_sequences",
    # weighted mixture interleave (per-source rank = keyed prefix scan)
    "doc_mixture_order",
    # per-type z-score outliers (O(types) broadcast stats, stream never
    # shuffles)
    "events_zscore",
    # n-gram novelty: bucketed min-combine per shingle + shingle-keyed join
    "doc_ngram_novelty",
    # bigram-LM cross-entropy: narrow (key, count) exchanges only
    "doc_bigram_lm",
    # SemDeDup: k-means partition + within-cluster chunked cosine dedup
    "emb_semdedup",
    # exact COUNT(DISTINCT) per group via a two-level distinct exchange
    "events_distinct_users",
    # join-free snapshot diff (added/removed/changed in one combine)
    "doc_snapshot_diff",
    # character-n-gram language ID: alphabet-bounded train exchange +
    # zero-shuffle broadcast-profile scoring
    "doc_langid",
    # exact substring duplication coverage: rolling-hash windows, two
    # keyed exchanges, per-doc interval union
    "doc_substring_dups",
    # PMI collocations: per-batch (w1,bg) partials, two keyed exchanges
    "doc_pmi_collocations",
    # inverted-index posting stats: mergeable per-batch token partials,
    # one token-keyed bucketed combine
    "doc_inverted_index",
    # zero-shuffle token-window chunking (RAG/pretrain context prep)
    "doc_chunk",
    # DSIR importance weights: one token-keyed exchange + broadcast scalars
    "doc_dsir_weights",
    # BPE tokenizer training: one corpus-scale exchange, then
    # vocabulary-bounded merge rounds
    "doc_bpe_merges",
    # multimodal context-window packing over the interleaved span table
    "span_pack",
]


def _consume(result) -> int:
    """Force execution; return row count."""
    if hasattr(result, "shape"):  # pandas DataFrame (.count() is per-column)
        return len(result)
    if hasattr(result, "count") and not hasattr(result, "column_names"):
        return result.count()
    return len(result)


def run_bench() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import pyarrow.parquet as pq

    from crawler_ray.pipelines.crawl import CrawlEngine
    from crawler_ray.pipelines.queries import QUERIES
    from crawler_ray.sources.miniweb import MiniWeb
    from crawler_ray.stages.dedupe import mark_duplicates

    # warm the page cache (measure compute + shuffle, not first disk read)
    for name in ("documents", "lineitem", "events", "embeddings"):
        pq.read_table(f"{SF_DIR}/{name}.parquet")
    # warm the Ray worker pool so neither parallelism level pays process
    # spawn inside the timed section
    import ray.data as _rd

    _rd.range(NUM_CPUS * 4).map_batches(
        lambda b: b, batch_size=1, num_cpus=1
    ).materialize()

    # ---- headline: flagship crawl sized from the sf documents table -------
    # Heavier pages (~10 KB, legal-document scale) + a deterministic 200 ms
    # simulated network RTT per request make the workload fetch/parse-bound,
    # as a real crawl is — the scaling criterion measures how that capacity
    # grows with CPUs, not the round-orchestration floor.
    n_docs = pq.read_metadata(f"{SF_DIR}/documents.parquet").num_rows
    web = MiniWeb(n_docs=n_docs, n_hosts=4, words_per_doc=2500)
    engine = CrawlEngine(
        web,
        budget_per_host=2048,
        max_rounds=64,
        seen_shards=max(2, NUM_CPUS // 8),
        seen_backend="cuckoo",
        fetch_batch_size=32,
        net_latency_sec=0.2,
        fetch_connections=FETCH_CONNS,
    )
    t0 = time.monotonic()
    result = engine.run()
    # pin pages once: the dedup pass + any downstream consumer would
    # otherwise re-execute the per-round page lineage per consumption
    pages = result.pages.materialize()
    n_pages = pages.count()
    crawl_sec = time.monotonic() - t0
    n_urls = result.seen_count

    # ---- checkpointed crawl: the resume-capable mode (mandatory at 100x
    # scale) in the orchestration-floor regime (conns=8), exercising the
    # per-round frontier snapshot + shard-side seen-delta parquet writes.
    # Runs only when queries run (the scaling criterion stays on the
    # headline 1-conn network-bound crawl).
    ckpt_sec = None
    ckpt_pages = None
    if not os.environ.get("GRAFT_SKIP_QUERIES"):
        import shutil
        import tempfile

        ck = tempfile.mkdtemp(prefix="bench-ckpt-")
        try:
            eng_ck = CrawlEngine(
                web,
                budget_per_host=2048,
                max_rounds=64,
                seen_shards=max(2, NUM_CPUS // 8),
                seen_backend="cuckoo",
                fetch_batch_size=32,
                net_latency_sec=0.2,
                fetch_connections=8,
                checkpoint_dir=ck,
            )
            t0 = time.monotonic()
            res_ck = eng_ck.run()
            ckpt_pages = res_ck.pages.materialize().count()
            ckpt_sec = round(time.monotonic() - t0, 3)
        finally:
            shutil.rmtree(ck, ignore_errors=True)

    queries_sec = {}
    if not os.environ.get("GRAFT_SKIP_QUERIES"):
        # duplicate marking is benched as its own stage (the headline is the
        # BASELINE.json metric: frontier URLs/s + pages fetched+parsed/s)
        t0 = time.monotonic()
        mark_duplicates(pages).count()
        queries_sec["mark_duplicates"] = round(time.monotonic() - t0, 3)
        for name in BENCH_QUERIES:
            t0 = time.monotonic()
            _consume(QUERIES[name](SF_DIR))
            queries_sec[name] = round(time.monotonic() - t0, 3)

    out = {
        "metric": "flagship_crawl_wall_sec",
        "value": round(crawl_sec, 3),
        "unit": "sec",
        "queries": queries_sec,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "crawl_pages": n_pages,
        "crawl_urls_seen": n_urls,
        "crawl_rounds": len(result.metrics),
        "pages_per_sec": round(n_pages / crawl_sec, 2),
        "urls_per_sec": round(n_urls / crawl_sec, 2),
    }
    if ckpt_sec is not None:
        out["crawl_checkpointed_conns8_sec"] = ckpt_sec
        out["crawl_checkpointed_pages"] = ckpt_pages
    ray.shutdown()
    return out


def run_scaling() -> dict:
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), PYTHONPATH=REPO,
                   GRAFT_SKIP_QUERIES="1")
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, check=True, cwd=REPO,
        )
        return json.loads(proc.stdout.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo, r_hi = one(lo), one(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "cpus_low": lo,
        "cpus_high": hi,
        "sec_low": r_lo["value"],
        "sec_high": r_hi["value"],
        "pages_per_sec_low": r_lo["pages_per_sec"],
        "pages_per_sec_high": r_hi["pages_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
