"""Scale-path checks for duplicate marking: the distributed stamp join must
produce byte-identical results to the broadcast stamp on a corpus that is
mostly duplicates (the boilerplate-heavy-crawl regime where a driver-side
mark dict would be unbounded)."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from crawler_ray.stages.dedupe import compute_marks, mark_duplicates


def _mostly_dup_pages(n: int = 2000, dup_frac: float = 0.6, seed: int = 7):
    """Synthetic pages table: `dup_frac` of rows share one of a few content
    hashes (exact dups), a band of near-identical simhashes exercises the
    fuzzy path, plus a list<struct> span column to prove Arrow payload
    fidelity through the join-path shuffle."""
    rng = np.random.default_rng(seed)
    url_hash = np.array([f"u{i:06d}" for i in range(n)], dtype=object)
    is_dup = rng.random(n) < dup_frac
    content = np.where(
        is_dup, rng.integers(0, 5, n).astype(str), np.arange(n).astype(str)
    )
    content_hash = np.array([f"c{v}" for v in content], dtype=object)
    base = np.int64(0x1234_5678_9ABC_DEF0)
    simhash = np.where(
        is_dup, base, base ^ (np.int64(1) << rng.integers(0, 64, n))
    ).astype(np.int64)
    spans = [
        [{"kind": "text", "text": f"t{i}", "media_ref": None, "offset": 0}]
        for i in range(n)
    ]
    t = pa.table(
        {
            "url_hash": pa.array(url_hash, type=pa.string()),
            "content_hash": pa.array(content_hash, type=pa.string()),
            "simhash": pa.array(simhash),
            "round": pa.array(np.zeros(n, dtype=np.int32)),
            "score": pa.array(np.arange(n, dtype=np.int64)),
            "spans": pa.array(
                spans,
                type=pa.list_(
                    pa.struct(
                        [
                            ("kind", pa.string()),
                            ("text", pa.string()),
                            ("media_ref", pa.string()),
                            ("offset", pa.int32()),
                        ]
                    )
                ),
            ),
        }
    )
    return t, float(is_dup.mean())


def _collect(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    df["spans"] = df["spans"].map(
        lambda s: tuple((d["kind"], d["text"], d["offset"]) for d in s)
    )
    return df.sort_values("url_hash").reset_index(drop=True)


def test_join_stamp_matches_broadcast_on_mostly_dup_corpus(ray_session):
    t, frac = _mostly_dup_pages()
    assert frac >= 0.5  # the regime the broadcast path cannot survive
    pages = rd.from_arrow(t)

    via_broadcast = _collect(mark_duplicates(pages, broadcast_limit=10**9))
    via_join = _collect(mark_duplicates(pages, broadcast_limit=0))

    pd.testing.assert_frame_equal(via_broadcast, via_join, check_like=True)
    # mostly-dup corpus really did produce an unbounded-class mark set
    assert via_broadcast["is_duplicate"].mean() >= 0.5


def test_marks_dataset_has_one_row_per_duplicate(ray_session):
    t, _ = _mostly_dup_pages(n=500)
    pages = rd.from_arrow(t)
    marks = compute_marks(pages).to_pandas()
    stamped = mark_duplicates(pages).to_pandas()
    assert len(marks) == int(stamped["is_duplicate"].sum())
    assert marks["url_hash"].is_unique
    # every mark's target exists, and fuzzy marks always point at a
    # DISTINCT-content page (reference semantics: the target must be an
    # earlier distinct-content page, though it may itself be a fuzzy dup
    # of an even-earlier page)
    targets = set(marks["dup_of"])
    assert targets <= set(stamped["url_hash"])
    content_dups = set(marks.loc[marks["similarity"] == 100, "url_hash"])
    fuzzy_targets = set(marks.loc[marks["similarity"] < 100, "dup_of"])
    assert not fuzzy_targets & content_dups


def test_minhash_join_path_matches_broadcast(ray_session, sf_dir, monkeypatch):
    """The distributed attach-join verify (used above the candidate
    threshold) must produce identical pairs to the candidate-only shingle
    broadcast."""
    import crawler_ray.pipelines.queries as q

    cols = ["a_doc_id", "b_doc_id"]
    a = (q.q_doc_minhash_pairs(sf_dir).to_pandas()
         .sort_values(cols).reset_index(drop=True))
    monkeypatch.setattr(q, "MINHASH_BROADCAST_CANDIDATES", 0)
    b = (q.q_doc_minhash_pairs(sf_dir).to_pandas()
         .sort_values(cols).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b, check_like=True)
    assert len(a) > 0


def test_join_paths_collect_nothing_on_driver(ray_session, monkeypatch):
    """Evidence for the O(corpus)-driver-state fix: with the broadcast
    thresholds forced to 0, marking duplicates and the minhash near-dup
    join complete WITHOUT a single take_all row reaching the driver."""
    import ray.data as rd_mod

    import crawler_ray.pipelines.queries as q
    from crawler_ray.stages.dedupe import mark_duplicates as md

    collected = {"rows": 0}
    real_take_all = rd_mod.Dataset.take_all

    def counting_take_all(self, *a, **kw):
        rows = real_take_all(self, *a, **kw)
        collected["rows"] += len(rows)
        return rows

    monkeypatch.setattr(rd_mod.Dataset, "take_all", counting_take_all)

    t, _ = _mostly_dup_pages(800)
    n = md(rd.from_arrow(t), broadcast_limit=0).count()
    assert n == 800
    assert collected["rows"] == 0

    monkeypatch.setattr(q, "MINHASH_BROADCAST_CANDIDATES", 0)
    assert q.q_doc_minhash_pairs("/root/testdata/sf0.001").count() > 0
    assert collected["rows"] == 0


def test_hot_band_group_pairs_are_exact(ray_session):
    """Structured fingerprints that pile thousands of DISTINCT fps into one
    (band, value) group must not go O(k^2) — and the recursive pigeonhole
    path must find exactly the same duplicate marks as brute force."""
    import pyarrow as pa

    from crawler_ray.stages import dedupe as dd

    rng = np.random.default_rng(3)
    n = 1200
    base = np.uint64(0xABCD_0000_0000_0000)
    # all fps share band3 (top 16 bits); differ in scattered low bits
    fps = base | rng.integers(0, 1 << 30, n).astype(np.uint64)
    fps = np.unique(fps)
    n = len(fps)
    t = pa.table(
        {
            "url_hash": pa.array([f"u{i:05d}" for i in range(n)]),
            "content_hash": pa.array([f"c{i}" for i in range(n)]),
            "simhash": pa.array(fps.view(np.int64)),
            "round": pa.array(np.zeros(n, dtype=np.int32)),
            "score": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    pages = rd.from_arrow(t)
    got = (
        mark_duplicates(pages).to_pandas()
        .sort_values("url_hash").reset_index(drop=True)
    )
    # brute-force expectation (reference semantics on distinct-content fps)
    exp_dup = {}
    for j in range(n):
        best = None
        for i in range(j):
            d = bin(int(fps[i] ^ fps[j])).count("1")
            if d <= dd.MAX_HAMMING and (best is None or d < best[0]):
                best = (d, i)
        if best is not None:
            exp_dup[f"u{j:05d}"] = (f"u{best[1]:05d}",
                                    max(0, min(100, int((1 - best[0] / 64) * 100))))
    assert int(got["is_duplicate"].sum()) == len(exp_dup)
    for _, row in got[got["is_duplicate"]].iterrows():
        want = exp_dup[row["url_hash"]]
        assert (row["duplicate_of"], row["similarity_score"]) == want
