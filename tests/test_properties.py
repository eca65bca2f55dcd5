"""Property-based invariants (hypothesis) for the scalar kernels."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from crawler_ray.functions.simhash import (
    from_signed, hamming_distance, simhash_batch, to_signed,
)
from crawler_ray.functions.url import normalize_url, normalize_url_batch

_path = st.text(alphabet=string.ascii_letters + string.digits + "/-_.", max_size=30)
_param = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=8)
_value = st.text(alphabet=string.ascii_letters + string.digits, max_size=8)


@st.composite
def urls(draw):
    host = draw(st.from_regex(r"[a-z][a-z0-9]{0,10}\.[a-z]{2,5}", fullmatch=True))
    path = draw(_path)
    params = draw(st.dictionaries(_param, _value, max_size=4))
    query = "&".join(f"{k}={v}" for k, v in params.items())
    frag = draw(st.sampled_from(["", "#frag"]))
    return f"https://{host}/{path}" + (f"?{query}" if query else "") + frag


@given(urls())
@settings(max_examples=200, deadline=None)
def test_normalize_idempotent(url):
    once = normalize_url(url)
    assert normalize_url(once) == once


@given(urls())
@settings(max_examples=100, deadline=None)
def test_normalize_drops_fragment_and_lowercases_host(url):
    out = normalize_url(url)
    assert "#" not in out
    host = out.split("://", 1)[1].split("/", 1)[0]
    assert host == host.lower()


@given(st.lists(st.text(min_size=0, max_size=80), min_size=1, max_size=20))
@settings(max_examples=50, deadline=None)
def test_simhash_batch_matches_singletons(texts):
    batch_fps, batch_valid = simhash_batch(texts)
    for i, t in enumerate(texts):
        solo_fps, solo_valid = simhash_batch([t])
        assert batch_fps[i] == solo_fps[0]
        assert batch_valid[i] == solo_valid[0]


@given(st.integers(min_value=0, max_value=(1 << 64) - 1))
@settings(max_examples=200, deadline=None)
def test_signed_roundtrip(fp):
    assert from_signed(to_signed(fp)) == fp


@given(st.text(min_size=1, max_size=60), st.text(min_size=1, max_size=60))
@settings(max_examples=50, deadline=None)
def test_hamming_symmetry(a, b):
    fa, va = simhash_batch([a])
    fb, vb = simhash_batch([b])
    d1 = hamming_distance(fa, fb)[0]
    d2 = hamming_distance(fb, fa)[0]
    assert d1 == d2 <= 64
    if va[0] and vb[0] and a == b:
        assert d1 == 0
