"""crawler_ray — a Ray-Data-native data-processing / crawl engine.

A from-scratch reimplementation of the data-processing capabilities of
LexiconIndonesia/crawler (reference at /root/reference, cited by file:line in
docstrings) expressed as ``ray.data.Dataset`` pipelines: ``map_batches`` over
zero-copy Arrow batches, actor pools for stateful stages (fetchers, URL-seen
shards), and groupby/sort shuffles only for the genuinely wide steps.

Layout:
- ``functions/``  pure scalar/vector kernels (URL normalize+hash, simhash,
  content normalization, pagination algebra, backoff, text stats, minhash).
- ``sources/``    deterministic synthetic mini-web + parquet IO helpers.
- ``state/``      sharded URL-seen set (exact + cuckoo), politeness budgets,
  robots, checkpoints.
- ``stages/``     map_batches stage implementations (fetch, parse, dedupe,
  ann, text stats, media stubs).
- ``pipelines/``  the flagship round-based crawl driver, the sequential
  golden-semantics interpreter, and the query library surfaced through
  ``__ray_entry__``.
"""

__version__ = "0.1.0"
