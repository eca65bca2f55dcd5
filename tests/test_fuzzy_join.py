"""Fuzzy string-similarity join: the pair-axis-vectorized Levenshtein DP
against a scalar reference implementation, plus the band-blocking
invariants the distributed plan relies on (each pair generated in exactly
one band; banding is lossless for dist <= FUZZY_MAX_DIST because
|len(a) - len(b)| <= levenshtein(a, b))."""

import random

import numpy as np

from crawler_ray.functions.text import edit_distance_batch


def ref_levenshtein(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    d = [[0] * (lb + 1) for _ in range(la + 1)]
    for i in range(la + 1):
        d[i][0] = i
    for j in range(lb + 1):
        d[0][j] = j
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            d[i][j] = min(
                d[i - 1][j] + 1,
                d[i][j - 1] + 1,
                d[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
            )
    return d[la][lb]


def test_edit_distance_batch_matches_reference():
    rng = random.Random(7)
    pairs = [
        (
            "".join(rng.choices("abcde", k=rng.randint(0, 9))),
            "".join(rng.choices("abcde", k=rng.randint(0, 9))),
        )
        for _ in range(500)
    ]
    pairs += [("", ""), ("abc", ""), ("", "xyz"), ("same", "same"),
              ("kitten", "sitting"), ("flaw", "lawn"), ("a" * 30, "a" * 29 + "b")]
    got = edit_distance_batch([p[0] for p in pairs], [p[1] for p in pairs])
    exp = np.array([ref_levenshtein(*p) for p in pairs])
    assert (got == exp).all()


def test_edit_distance_batch_empty():
    assert edit_distance_batch([], []).shape == (0,)


def test_edit_distance_unicode():
    got = edit_distance_batch(["héllo", "日本語"], ["hello", "日本"])
    assert got.tolist() == [1, 1]


def test_length_band_lower_bound():
    """|len(a)-len(b)| <= dist — the property that makes min-length banding
    lossless at FUZZY_MAX_DIST."""
    rng = random.Random(11)
    for _ in range(200):
        a = "".join(rng.choices("ab", k=rng.randint(0, 8)))
        b = "".join(rng.choices("ab", k=rng.randint(0, 8)))
        assert abs(len(a) - len(b)) <= ref_levenshtein(a, b)


def test_fuzzy_pairs_unique_band():
    """Each candidate pair is generated in exactly ONE band: the band equal
    to min(len a, len b) — asserted by replaying the emission rule."""
    names = ["abc", "abcd", "abcde", "xy", "xyz", "x"]
    d = 2
    emitted = {}
    for nm in names:
        for k in range(d + 1):
            band = len(nm) - k
            if band >= 0:
                emitted.setdefault(band, []).append(nm)
    seen_pairs = []
    for band, members in emitted.items():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                a, b = members[i], members[j]
                if a == b:
                    continue
                if min(len(a), len(b)) == band:
                    seen_pairs.append(tuple(sorted((a, b))))
    # every |len diff| <= d pair appears exactly once
    import itertools

    expect = [
        tuple(sorted(p))
        for p in itertools.combinations(names, 2)
        if abs(len(p[0]) - len(p[1])) <= d
    ]
    assert sorted(seen_pairs) == sorted(expect)


def test_part_fuzzy_pairs_oracle_shape(ray_session, sf_dir):
    """Structural check (the value-exact oracle compare runs in
    test_oracle.py): pairs are canonical (name_a < name_b), within the
    distance bound, and deduplicated."""
    from crawler_ray.pipelines.queries import FUZZY_MAX_DIST, QUERIES

    df = QUERIES["part_fuzzy_pairs"](sf_dir).to_pandas()
    assert (df["name_a"] < df["name_b"]).all()
    assert (df["dist"] <= FUZZY_MAX_DIST).all()
    assert not df.duplicated(["name_a", "name_b"]).any()
    got = edit_distance_batch(df["name_a"].tolist(), df["name_b"].tolist())
    assert (got == df["dist"].to_numpy()).all()


def test_edit_distance_within_matches_saturated_reference():
    from crawler_ray.functions.text import edit_distance_within

    rng = random.Random(23)
    pairs = [
        (
            "".join(rng.choices("abcd e", k=rng.randint(0, 14))),
            "".join(rng.choices("abcd e", k=rng.randint(0, 14))),
        )
        for _ in range(800)
    ]
    pairs += [("", ""), ("abc", ""), ("", "xyz"), ("same", "same"),
              ("kitten", "sitting"), ("a" * 30, "a" * 29 + "b"),
              ("abcdef", "fedcba")]
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    exp_full = np.array([ref_levenshtein(*p) for p in pairs])
    for d in (0, 1, 2, 3, 5):
        got = edit_distance_within(a, b, d)
        assert (got == np.minimum(exp_full, d + 1)).all(), d


def test_charcount_lower_bound_is_valid():
    # the band_pairs prefilter relies on ed >= L1(char counts) / 2 —
    # check the bound against the reference DP on random mutations
    rng = random.Random(9)
    for _ in range(300):
        s = "".join(rng.choices("abcdef ", k=rng.randint(1, 20)))
        t = list(s)
        for _ in range(rng.randint(0, 4)):
            op = rng.randrange(3)
            if op == 0 and t:
                t[rng.randrange(len(t))] = rng.choice("abcdef ")
            elif op == 1:
                t.insert(rng.randrange(len(t) + 1), rng.choice("abcdef "))
            elif t:
                del t[rng.randrange(len(t))]
        t = "".join(t)
        from collections import Counter

        ca, cb = Counter(s), Counter(t)
        l1 = sum(abs(ca[c] - cb[c]) for c in set(ca) | set(cb))
        assert ref_levenshtein(s, t) >= -(-l1 // 2)
