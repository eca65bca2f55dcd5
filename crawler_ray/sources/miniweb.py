"""Deterministic synthetic mini-web: the sandbox stand-in for the network.

The reference crawls real Indonesian legal-document sites (list pages with
pagination linking detail pages; see
``/root/reference/crawler/services/step_executors/crawl_executor.py:73-249``
and ``website_summary.yaml``).  In this sealed sandbox the fetch stage is a
pure function ``fetch(url) -> (status, html)``: every page is generated
deterministically from the URL itself (sha256-seeded), so the web scales to
any size with zero lookup state, the same way at 8 or 32 CPUs, and two
independent engines (the sequential golden interpreter and the Ray pipeline)
observe the identical web.

Structure per host:
- ``https://{host}/list?page={k}`` (k=1..list_pages): a paginated list page
  linking `details_per_list` detail pages, the next list page, occasional
  cross-host links, tracking-param variants of detail URLs (exercising URL
  canonicalization), duplicate links, dead links, and robots-disallowed
  links.
- ``https://{host}/doc/{n}``: a detail page with title, paragraphs, an image
  (media span) and a couple of related-doc links.  Some detail pages are
  content-duplicates of others (exact dup), some near-duplicates (one
  paragraph perturbed), exercising the dedup joins.
- ``https://{host}/private/{n}``: robots-disallowed.
- ``https://{host}/doc/{n}`` with n >= n_docs: HTTP 404.
- "flaky" detail pages return 500 until `retry_count` reaches 1 (deterministic
  retry semantics, exercising the retry/backoff path of
  ``/root/reference/crawler/services/retry_policy.py``).

One mega-host holds ``mega_share`` of all documents (skew handling per the
north rule: the reference's putusan3.mahkamahagung.go.id dominates its
corpus).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

MEGA_HOST = "putusan.example.id"
ROBOTS_DISALLOW = ("/private/",)


def _h64(s: str) -> int:
    return int.from_bytes(hashlib.sha256(s.encode()).digest()[:8], "big")


@dataclass(frozen=True)
class MiniWeb:
    """Parameters fully describing a deterministic synthetic web."""

    n_docs: int = 500                     # total detail pages across hosts
    n_hosts: int = 4                      # including the mega-host
    mega_share: float = 0.5               # fraction of docs on the mega-host
    details_per_list: int = 10            # detail links per list page
    seed: int = 42
    dup_every: int = 17                   # every k-th doc duplicates doc n-k
    near_dup_every: int = 13              # every k-th doc near-duplicates n-k
    flaky_every: int = 23                 # every k-th doc 500s until 1 retry
    dead_link_every: int = 7              # list pages embed a dead link
    cross_link_every: int = 3             # list pages embed a cross-host link
    words_per_doc: int = 60               # body weight (bench uses heavier pages)
    # The reference expands pagination upfront (crawl_executor.py:272-303
    # generates the page-1..N URL list from the seed before fetching), so a
    # list page exposes the full paginator, capped like the reference's
    # max_pages=100 (crawler/services/pagination.py:41); deeper pages chain
    # via "next" links only.
    paginator_window: int = 100
    vocab: tuple[str, ...] = field(
        default=(
            "putusan", "mahkamah", "agung", "nomor", "tahun", "tentang",
            "perkara", "pidana", "perdata", "hukum", "pasal", "undang",
            "peraturan", "menteri", "daerah", "pengadilan", "negeri", "tinggi",
            "banding", "kasasi", "terdakwa", "penggugat", "tergugat", "hakim",
            "sidang", "berita", "acara", "salinan", "resmi", "lembaran",
        )
    )

    # ------------------------------------------------------------------ hosts
    def hosts(self) -> list[str]:
        return [MEGA_HOST] + [f"host{i}.example.id" for i in range(1, self.n_hosts)]

    def docs_on_host(self, host: str) -> int:
        hosts = self.hosts()
        mega = int(self.n_docs * self.mega_share)
        rest = self.n_docs - mega
        if host == MEGA_HOST:
            return mega
        small = hosts[1:]
        idx = small.index(host)
        per = rest // len(small)
        return per + (rest % len(small) if idx == 0 else 0)

    def list_pages_on_host(self, host: str) -> int:
        n = self.docs_on_host(host)
        return max(1, -(-n // self.details_per_list))  # ceil

    def seeds(self) -> list[str]:
        """Round-0 seed list: page 1 of each host's listing."""
        return [f"https://{h}/list?page=1" for h in self.hosts()]

    # ------------------------------------------------------------- documents
    def _doc_words(self, host: str, n: int) -> list[str]:
        """Deterministic word stream for a detail page's body."""
        rng = _h64(f"{self.seed}:{host}:{n}:body")
        words = []
        for i in range(self.words_per_doc):
            rng = (rng * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            w = self.vocab[rng % len(self.vocab)]
            # ~1 in 4 tokens carries a numeral (case numbers, articles,
            # years) so long documents have realistic token diversity —
            # with a bare 30-word vocab every long doc converges to the
            # same simhash (bias >> variance) and near-dup joins degenerate
            if rng % 4 == 0:
                w = f"{w}{(rng >> 8) % 1000}"
            words.append(w)
        return words

    def doc_body_paragraphs(self, host: str, n: int) -> list[str]:
        """Detail-page paragraphs, with exact/near-dup structure.

        Iterative chain resolution (the recursive form blew the Python
        recursion limit at ~17k docs: chain depth = n / dup_every): walk
        the dup/near-dup chain down to its base doc, then replay the
        near-dup perturbations from the base outward — byte-identical to
        the recursion's deepest-first application order."""
        perturb: list[int] = []
        while True:
            if self.dup_every and n % self.dup_every == 0 and n >= self.dup_every:
                n -= self.dup_every
                continue
            if (
                self.near_dup_every
                and n % self.near_dup_every == 0
                and n >= self.near_dup_every
            ):
                perturb.append(n)
                n -= self.near_dup_every
                continue
            break
        words = self._doc_words(host, n)
        paras = [" ".join(words[i : i + 15]) for i in range(0, len(words), 15)]
        for pn in reversed(perturb):
            # perturb one word of the last paragraph -> near duplicate
            w = paras[-1].split()
            w[-1] = self.vocab[pn % len(self.vocab)]
            paras = paras[:-1] + [" ".join(w)]
        return paras

    def is_flaky(self, host: str, n: int) -> bool:
        return bool(self.flaky_every) and n % self.flaky_every == self.flaky_every - 1

    # ----------------------------------------------------------------- fetch
    def fetch(self, url: str, retry_count: int = 0) -> tuple[int, str]:
        """The synthetic network: URL (+ retry attempt) -> (status, html)."""
        from urllib.parse import parse_qs, urlparse

        p = urlparse(url)
        host, path = p.netloc.lower(), p.path
        if host not in self.hosts():
            return 404, ""
        if path.startswith("/private/"):
            # robots-disallowed; a polite crawler never requests it, but the
            # page exists (fetching it would "work") — conformance checks
            # that neither engine ever fetches one.
            return 200, "<html><title>private</title></html>"
        if path == "/robots.txt":
            return 200, "".join(f"Disallow: {d}\n" for d in ROBOTS_DISALLOW)
        if path == "/list":
            page = int(parse_qs(p.query).get("page", ["1"])[0])
            if 1 <= page <= self.list_pages_on_host(host):
                return 200, self._list_html(host, page)
            return 404, ""
        if path == "/api/docs":
            # JSON listing endpoint (reference S2 API fetch path,
            # /root/reference/crawler/services/step_executors/api_executor.py)
            page = int(parse_qs(p.query).get("page", ["1"])[0])
            if 1 <= page <= self.list_pages_on_host(host):
                return 200, self._api_docs_json(host, page)
            return 404, ""
        if path.startswith("/api/doc/"):
            # JSON detail endpoint; same flaky semantics as the HTML view
            import json

            try:
                n = int(path.rsplit("/", 1)[1])
            except ValueError:
                return 404, ""
            if not (0 <= n < self.docs_on_host(host)):
                return 404, ""
            if self.is_flaky(host, n) and retry_count < 1:
                return 500, ""
            paras = self.doc_body_paragraphs(host, n)
            return 200, json.dumps(
                {
                    "id": n,
                    "title": self.doc_title(host, n),
                    "paragraphs": paras,
                    "meta": {"host": host, "n_paragraphs": len(paras)},
                },
                ensure_ascii=False,
            )
        if path.startswith("/doc/"):
            try:
                n = int(path.rsplit("/", 1)[1])
            except ValueError:
                return 404, ""
            if not (0 <= n < self.docs_on_host(host)):
                return 404, ""
            if self.is_flaky(host, n) and retry_count < 1:
                return 500, ""
            return 200, self._doc_html(host, n)
        return 404, ""

    # ------------------------------------------------------------------ html
    def _doc_html(self, host: str, n: int) -> str:
        paras = self.doc_body_paragraphs(host, n)
        body = "\n".join(f"<p>{p}</p>" for p in paras)
        rel = [
            f'<a href="/doc/{(n * 7 + k) % self.docs_on_host(host)}">related {k}</a>'
            for k in (1, 2)
        ]
        # title derives from the body (not n) so content-duplicate docs have
        # byte-identical normalized text -> identical content_hash
        title = "Dokumen " + " ".join(paras[0].split()[:3])
        return (
            f'<html><head><meta charset="utf-8">'
            f'<link rel="stylesheet" href="/static/s.css">'
            f"<title>{title}</title></head><body>"
            f'<nav><a href="/list?page=1">beranda</a></nav>'
            f"<article>{body}"
            f'<img src="https://{host}/media/doc{n}.png">'
            f"{' '.join(rel)}</article>"
            f'<footer class="ad-footer">iklan</footer></body></html>'
        )

    def doc_title(self, host: str, n: int) -> str:
        """Title shared by the HTML and JSON views of a detail page."""
        paras = self.doc_body_paragraphs(host, n)
        return "Dokumen " + " ".join(paras[0].split()[:3])

    def _api_docs_json(self, host: str, page: int) -> str:
        """JSON body of the /api/docs listing: nested metadata + item list
        (exercises dot-path navigation incl. list indices)."""
        import json

        n_docs = self.docs_on_host(host)
        total = self.list_pages_on_host(host)
        start = (page - 1) * self.details_per_list
        items = [
            {
                "id": i,
                "url": f"https://{host}/doc/{i}",
                "api_url": f"https://{host}/api/doc/{i}",
                "title": self.doc_title(host, i),
            }
            for i in range(start, min(start + self.details_per_list, n_docs))
        ]
        return json.dumps(
            {
                "meta": {"page": page, "total_pages": total, "host": host},
                "items": items,
                "next": (
                    f"https://{host}/api/docs?page={page + 1}"
                    if page < total else None
                ),
            },
            ensure_ascii=False,
        )

    def _list_html(self, host: str, page: int) -> str:
        n_docs = self.docs_on_host(host)
        start = (page - 1) * self.details_per_list
        links = []
        for i in range(start, min(start + self.details_per_list, n_docs)):
            href = f"/doc/{i}"
            if i % 5 == 0:
                # tracking-param variant of the same URL (canonicalizes away)
                href = f"https://{host}/doc/{i}?utm_source=list&utm_campaign=c{page}"
            links.append(f'<a href="{href}">dokumen {i}</a>')
            if i % 4 == 0:
                links.append(f'<a href="/doc/{i}">dokumen {i} (dup)</a>')
        if self.dead_link_every and page % self.dead_link_every == 0:
            links.append(f'<a href="/doc/{n_docs + page}">rusak</a>')
        if self.cross_link_every and page % self.cross_link_every == 0:
            other = self.hosts()[(page + self.hosts().index(host)) % len(self.hosts())]
            links.append(f'<a href="https://{other}/list?page=1">mitra</a>')
        links.append(f'<a href="/private/{page}">internal</a>')
        # paginator window around the current page (reference-style upfront
        # pagination expansion, crawl_executor.py:272-303, capped like
        # max_pages=100), plus a plain next link
        n_list = self.list_pages_on_host(host)
        half = self.paginator_window // 2
        lo = max(1, page - half)
        hi = min(n_list, page + half)
        for p in range(lo, hi + 1):
            if p != page:
                links.append(f'<a href="/list?page={p}">hal {p}</a>')
        if page < n_list:
            links.append(f'<a href="/list?page={page + 1}">berikutnya</a>')
        items = "\n".join(f"<li>{a}</li>" for a in links)
        return (
            f'<html><head><meta charset="utf-8">'
            f"<title>Daftar {host} halaman {page}</title></head>"
            f"<body><main><ul>{items}</ul></main></body></html>"
        )


def miniweb_for_sf(sf_dir: str) -> MiniWeb:
    """Size the mini-web from the driver's documents table row count."""
    import pyarrow.parquet as pq

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    return MiniWeb(n_docs=n)


_PAGED_BODY = (
    "<html><head><title>halaman {n}</title></head><body><main><ul>"
    + "".join(f'<li><a href="/doc/{{n}}{i}">dokumen</a></li>' for i in range(8))
    + "</ul>{pad}</main></body></html>"
)
_PAGED_PAD = "lorem ipsum " * 20  # keeps real pages past min_content_length


@dataclass
class PagedStubWeb:
    """A synthetic site whose /list pagination misbehaves in a configurable
    way — fixture for the early-stop chain semantics (reference
    ``services/pagination.py:213-252``).

    ``mode``:
    - ``identical``: pages > real_pages serve page ``real_pages``'s content
      verbatim (the out-of-range-page-returns-last-page pattern)
    - ``empty``: pages > real_pages serve 200 with a near-empty body
    - ``ok404``: pages > real_pages 404 (plain truncation)
    """

    real_pages: int = 3
    mode: str = "identical"

    def fetch(self, url: str, retry_count: int = 0) -> tuple[int, str]:
        from urllib.parse import parse_qs, urlparse

        p = urlparse(url)
        if p.path == "/robots.txt":
            return 200, ""
        if p.path.startswith("/doc/"):
            return 200, _PAGED_BODY.format(n=p.path, pad=_PAGED_PAD)
        if p.path != "/list":
            return 404, ""
        page = int(parse_qs(p.query).get("page", ["1"])[0])
        if page <= self.real_pages:
            return 200, _PAGED_BODY.format(n=page, pad=_PAGED_PAD)
        if self.mode == "identical":
            return 200, _PAGED_BODY.format(n=self.real_pages, pad=_PAGED_PAD)
        if self.mode == "empty":
            return 200, "<html></html>"
        return 404, ""
