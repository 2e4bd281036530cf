"""URL canonicalization — the normalization pass a web-scale crawl dedup
runs before exact/near dedup (without it, `HTTP://Site.COM:80/a/?b=2&a=1`
and `http://site.com/a?a=1&b=2` count as different documents and every
downstream dedup undercounts).

All steps are JVM column expressions inside the Java-regex ∩ RE2 common
subset (no backrefs/lookarounds), so the DuckDB oracle replays them
bit-identically. Canonical form:

1. fragment dropped,
2. scheme and host lowercased,
3. default port stripped (``:80`` for http, ``:443`` for https),
4. empty path → ``/``; trailing slash trimmed otherwise,
5. tracking params (``utm_*``) dropped; remaining query params sorted
   byte-lexicographically (both engines use binary collation).

Reference parity: the reference builds and compares listing URLs as raw
strings (reference listing.py:9, hunter.py's dedup-by-URL habit); this is
that comparison done right.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def canonicalize_url(url: Column) -> Column:
    base = F.regexp_replace(url, "#.*$", "")
    scheme = F.lower(F.regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(base, "^[^:]+://([^/?]+)", 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    raw_path = F.regexp_extract(base, "^[^:]+://[^/?]+([^?]*)", 1)
    path = F.when(
        (raw_path == "") | (raw_path == "/"), F.lit("/")
    ).otherwise(F.regexp_replace(raw_path, "/$", ""))
    qraw = F.regexp_extract(base, "\\?(.*)$", 1)
    params = F.filter(
        F.split(qraw, "&"),
        lambda p: (p != "") & (~p.startswith("utm_")),
    )
    qstr = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(F.array_sort(params), "&"))
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, path, qstr)


def extract_main_text(html: Column) -> Column:
    """Boilerplate-stripping main-content extraction (trafilatura-lite):
    drop <script>/<style> subtrees, keep only the <main> region, turn
    paragraph boundaries into newlines, strip remaining tags, decode the
    basic HTML entities, and collapse runs of spaces. Pure JVM regexp
    expressions in the Java∩RE2 subset (non-greedy quantifiers, no
    lookarounds), replayed bit-identically by the SQL oracle."""
    x = F.regexp_replace(html, "<script[^>]*>.*?</script>", "")
    x = F.regexp_replace(x, "<style[^>]*>.*?</style>", "")
    x = F.regexp_extract(x, "<main[^>]*>(.*?)</main>", 1)
    x = F.regexp_replace(x, "</p>\\s*<p[^>]*>", "\n")
    x = F.regexp_replace(x, "<[^>]+>", "")
    for ent, ch in (("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", "\""), ("&#39;", "'")):
        x = F.regexp_replace(x, ent, ch)
    x = F.regexp_replace(x, "  +", " ")
    return F.trim(x)
