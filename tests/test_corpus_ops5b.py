"""Planted-case semantics for the round-5b operators (z-score outliers,
n-gram novelty, bigram-LM cross-entropy, SemDeDup); value-exact oracle
compares run in test_oracle.py."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write(tmp_path, name, table: pa.Table):
    pq.write_table(table, str(tmp_path / f"{name}.parquet"))


def test_zscore_flags_planted_outlier(ray_session, tmp_path):
    """99 unit values + one spike: only the spike is flagged, with the
    naive-formula z; a zero-variance type emits nothing."""
    vals = [1.0] * 99 + [100.0]
    t = pa.table(
        {
            "event_id": pa.array(range(200), pa.int64()),
            "event_type": pa.array(["a"] * 100 + ["flat"] * 100),
            "value": pa.array(vals + [7.0] * 100, pa.float64()),
        }
    )
    _write(tmp_path, "events", t)
    from crawler_ray.pipelines.queries import QUERIES

    out = QUERIES["events_zscore"](str(tmp_path)).to_pandas()
    assert list(out["event_id"]) == [99]
    v = np.asarray(vals)
    z = (100.0 - v.mean()) / np.sqrt((v**2).mean() - v.mean() ** 2)
    assert abs(out["z"].iloc[0] - round(z, 6)) < 1e-9
    assert not (out["event_type"] == "flat").any()


def test_ngram_novelty_planted(ray_session, tmp_path):
    """doc 1 is all-novel; doc 2 shares one of its two shingles with
    doc 1; a doc under 3 tokens emits nothing."""
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["a b c d", "a b c x", "too short"]),
        }
    )
    _write(tmp_path, "documents", t)
    from crawler_ray.pipelines.queries import QUERIES

    out = (
        QUERIES["doc_ngram_novelty"](str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(out.index) == [1, 2]
    assert out.loc[1, "n_shingles"] == 2 and out.loc[1, "n_seen_before"] == 0
    assert out.loc[1, "novelty_frac"] == 1.0
    assert out.loc[2, "n_shingles"] == 2 and out.loc[2, "n_seen_before"] == 1
    assert out.loc[2, "novelty_frac"] == 0.5


def test_bigram_lm_hand_case(ray_session, tmp_path):
    """Two tiny docs; xent recomputed by hand from the add-one-smoothed
    model.  Corpus: doc1 'a b a b' (bigrams ab, ba, ab), doc2 'a b c'
    (ab, bc).  V=3; c(a b)=3 across docs, c(b a)=1, c(b c)=1;
    c_left(a)=3, c_left(b)=2."""
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["a b a b", "a b c"]),
        }
    )
    _write(tmp_path, "documents", t)
    from crawler_ray.pipelines.queries import QUERIES

    out = (
        QUERIES["doc_bigram_lm"](str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    V = 3.0
    c_ab, c_ba, c_bc = 3.0, 1.0, 1.0
    cl_a, cl_b = 3.0, 2.0
    lp_ab = np.log((c_ab + 1) / (cl_a + V))
    lp_ba = np.log((c_ba + 1) / (cl_b + V))
    lp_bc = np.log((c_bc + 1) / (cl_b + V))
    assert out.loc[1, "n_bigrams"] == 3
    assert abs(out.loc[1, "xent"] - round(-(2 * lp_ab + lp_ba) / 3, 6)) < 1e-9
    assert out.loc[2, "n_bigrams"] == 2
    assert abs(out.loc[2, "xent"] - round(-(lp_ab + lp_bc) / 2, 6)) < 1e-9


def test_distinct_users_planted(ray_session, tmp_path):
    """Duplicated (type, user) pairs collapse; counts are exact."""
    t = pa.table(
        {
            "event_id": pa.array(range(6), pa.int64()),
            "event_type": pa.array(["a", "a", "a", "b", "b", "b"]),
            "user_id": pa.array([1, 1, 2, 1, 2, 3], pa.int64()),
        }
    )
    _write(tmp_path, "events", t)
    from crawler_ray.pipelines.queries import QUERIES

    out = (
        QUERIES["events_distinct_users"](str(tmp_path))
        .to_pandas()
        .set_index("event_type")
        .sort_index()
    )
    assert out.loc["a", "n_users"] == 2 and out.loc["b", "n_users"] == 3


def test_snapshot_diff_planted(ray_session, tmp_path):
    """One id per status: 17 removed, 13 changed, 19 sources an added row,
    1 unchanged (absent); 221 = 13*17 is removed (removal wins)."""
    ids = [1, 13, 17, 19, 221]
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([f"text {i}" for i in ids]),
        }
    )
    _write(tmp_path, "documents", t)
    from crawler_ray.pipelines.queries import DIFF_ADD_OFFSET, QUERIES

    out = (
        QUERIES["doc_snapshot_diff"](str(tmp_path))
        .to_pandas()
        .set_index("doc_id")["status"]
        .sort_index()
    )
    assert out.to_dict() == {
        13: "changed",
        17: "removed",
        221: "removed",
        19 + DIFF_ADD_OFFSET: "added",
    }


def test_semdedup_planted_exact_duplicate(ray_session, tmp_path, sf_dir):
    """Appending an exact copy of an existing vector (higher id) marks the
    copy a duplicate in the same cluster, collapsing to an EARLIER id;
    keepers carry dup_of == -1 and every dup_of precedes its row."""
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    copy = t.slice(0, 1).to_pydict()
    copy["vec_id"] = [10_000]
    _write(tmp_path, "embeddings", pa.concat_tables(
        [t, pa.Table.from_pydict(copy, schema=t.schema)]
    ))
    from crawler_ray.pipelines.queries import QUERIES

    out = (
        QUERIES["emb_semdedup"](str(tmp_path))
        .to_pandas()
        .set_index("vec_id")
        .sort_index()
    )
    planted = out.loc[10_000]
    orig = out.loc[t["vec_id"][0].as_py()]
    assert bool(planted["is_dup"]) and planted["dup_of"] < 10_000
    assert planted["cluster"] == orig["cluster"]
    dups = out[out["is_dup"]]
    assert (dups["dup_of"] < dups.index.to_numpy()).all()
    assert (out.loc[~out["is_dup"], "dup_of"] == -1).all()


def test_char_bigram_codes_boundaries_and_multibyte():
    """Pairs never span documents; multibyte codepoints decode as single
    units; code order equals UTF-8 binary order of the 2-char string."""
    from crawler_ray.pipelines.queries import _char_bigram_codes

    codes, di = _char_bigram_codes(["ab", "", "c", "日本語"])
    # "ab" -> 1 pair from doc 0; "c" has none; "日本語" -> 2 pairs from doc 3
    assert list(di) == [0, 3, 3]
    assert codes[0] == (ord("a") << 21) | ord("b")
    assert codes[1] == (ord("日") << 21) | ord("本")
    # tie-order claim: integer order == UTF-8 byte order of the bigram
    import itertools

    grams = ["ab", "aB", "zz", "日本", "本語", "éà"]
    enc = sorted(grams, key=lambda g: g.encode("utf-8"))
    by_code = sorted(grams, key=lambda g: (ord(g[0]) << 21) | ord(g[1]))
    assert enc == by_code
    # degenerate inputs
    c0, d0 = _char_bigram_codes([])
    c1, d1 = _char_bigram_codes(["", "x"])
    assert len(c0) == len(d0) == len(c1) == len(d1) == 0


def test_langid_planted_profiles(ray_session, tmp_path):
    """Two synthetic 'languages' with disjoint alphabets: every doc
    predicts its own language; a 1-char doc predicts 'und' (score 0)."""
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "lang": pa.array(["aa", "aa", "bb", "bb", "aa"]),
            "text": pa.array(
                ["abababab", "ababab", "cdcdcdcd", "cdcdcd", "x"]
            ),
            "source": pa.array(["s"] * 5),
            "n_chars": pa.array([8, 6, 8, 6, 1], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    from crawler_ray.pipelines.queries import QUERIES

    out = (
        QUERIES["doc_langid"](str(tmp_path))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert list(out["pred_lang"]) == ["aa", "aa", "bb", "bb", "und"]
    assert list(out["is_match"]) == [True, True, True, True, False]
    assert out["score"].iloc[4] == 0 and (out["score"].iloc[:4] > 0).all()


def test_substring_dups_interval_union(ray_session, tmp_path):
    """Two docs share one 30-char run (W=24, S=4): overlapping duplicated
    windows collapse to the run's true char coverage; a unique doc has 0
    dups; a doc shorter than W emits nothing."""
    shared = "XYZQWJKVBNMLPOIUYTREWQASDFGHZX"  # 30 chars, unique-ish
    a = shared + "a" * 40  # run at positions 0..29
    # run starts at 40 (stride-aligned, 40 % S == 0) so both docs sample
    # the SAME 24-grams out of the run — strided windowing only detects
    # duplicates whose alignments agree mod S (see operator docstring)
    b = "b" * 40 + shared
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "lang": pa.array(["en"] * 4),
            "text": pa.array([a, b, "u" * 5, "c" + "d" * 30 + "e" * 30]),
            "source": pa.array(["s"] * 4),
            "n_chars": pa.array(
                [len(a), len(b), 5, 61], pa.int64()
            ),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    from crawler_ray.pipelines.queries import (
        DOC_SUBSTR_STRIDE as S,
        DOC_SUBSTR_W as W,
        QUERIES,
    )

    out = (
        QUERIES["doc_substring_dups"](str(tmp_path))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    # doc 2 (5 chars < W) absent
    assert list(out["doc_id"]) == [0, 1, 3]
    r0 = out.iloc[0]
    # doc 0: shared run spans [0, 30); windows fully inside it start at
    # 0 and 4 -> dup windows {0, 4}; union = [0, 4+W) = 28 chars
    assert r0["n_dup_windows"] == 2 and r0["dup_chars"] == 4 + W
    # doc 1: run occupies [40, 70); starts 40, 44 sample the same two
    # 24-grams; union again 28 chars (overlap collapsed)
    r1 = out.iloc[1]
    assert r1["n_dup_windows"] == 2 and r1["dup_chars"] == 4 + W
    # doc 3 shares nothing
    r3 = out.iloc[2]
    assert r3["n_dup_windows"] == 0 and r3["dup_chars"] == 0
    assert r3["dup_frac"] == 0.0


def test_substring_dups_hash_faithful_to_strings(ray_session, tmp_path):
    """The 128-bit rolling-hash window keys must reproduce EXACT string
    equality: a seeded corpus built from a tiny alphabet (so repeated
    windows are common) is checked doc-by-doc against a brute-force
    string-comparison reference of the same W/S semantics."""
    import numpy as np

    from crawler_ray.pipelines.queries import (
        DOC_SUBSTR_STRIDE as S,
        DOC_SUBSTR_W as W,
        QUERIES,
    )

    rng = np.random.default_rng(7)
    shared = "".join(rng.choice(list("abc"), 40))
    texts = []
    for i in range(60):
        n = int(rng.integers(0, 90))
        t = "".join(rng.choice(list("abc"), n))
        if i % 3 == 0 and n >= 30:
            # splice the shared run at an arbitrary (often unaligned) spot
            k = int(rng.integers(0, n - 20))
            t = t[:k] + shared + t[k:]
        texts.append(t)

    # brute-force reference: exact string windows
    from collections import defaultdict

    owners = defaultdict(set)
    wins = []
    for d, t in enumerate(texts):
        ps = list(range(0, len(t) - W + 1, S))
        wins.append([(p, t[p : p + W]) for p in ps])
        for _, s in wins[-1]:
            owners[s].add(d)
    expect = {}
    for d, ws in enumerate(wins):
        if not ws:
            continue
        dup = [(p, s) for p, s in ws if len(owners[s]) >= 2]
        cov = 0
        for j, (p, _) in enumerate(dup):
            nxt = dup[j + 1][0] if j + 1 < len(dup) else None
            cov += min(W, nxt - p) if nxt is not None else W
        expect[d] = (len(ws), len(dup), cov)

    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = QUERIES["doc_substring_dups"](str(tmp_path)).to_pandas()
    got = {
        int(r.doc_id): (int(r.n_windows), int(r.n_dup_windows), int(r.dup_chars))
        for r in out.itertuples()
    }
    assert got == expect
