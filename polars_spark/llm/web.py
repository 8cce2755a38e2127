"""Web-corpus curation operators: URL canonicalization, host / registered-
domain extraction, per-domain caps and blocklist filtering.

Large-scale web-crawl pipelines (RefinedWeb, CCNet, C4) spend a whole stage
on URL hygiene before any text filtering: canonicalize URLs so exact-dup
detection works across syntactic variants, extract the registered domain for
per-domain quotas (no single site dominating the corpus), and drop
blocklisted domains.  Every operator here is pure JVM-side column algebra
(regexp over Catalyst) — no Python UDFs, no shuffles except where the
semantics require one (the per-domain cap is a single partitioned window).

Scale notes (100 TB): url_normalize / url_host / registered_domain are
projections — they pipeline into whatever scan feeds them and cost no
shuffle.  cap_per_domain shuffles once on the domain key (the same shuffle a
group-by on domain would take; skew from giant domains is exactly what
AQE skew-split / salting handles).  filter_blocked_domains broadcasts the
blocklist (thousands of rows at most) — never a shuffle of the corpus.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "url_host",
    "url_normalize",
    "registered_domain",
    "cap_per_domain",
    "filter_blocked_domains",
    "domain_stats",
    "html_to_text",
    "extract_links",
]

# query parameters that never identify content (tracking / attribution)
TRACKING_PARAMS = r"utm_[a-z0-9_]+|gclid|fbclid|msclkid|ref|mc_cid|mc_eid"

# country-code second-level suffixes where the registered domain is the
# LAST THREE labels (kept to a deterministic, documented subset — full
# public-suffix parity would vendor the PSL, which changes monthly)
_SLD_SUFFIX = r"(?:co|com|org|net|ac|gov|edu)\.(?:uk|jp|au|in|br|cn|nz|za)"

_AUTHORITY = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"


def url_host(url: Column) -> Column:
    """Lower-cased hostname of a URL (port and userinfo stripped)."""
    host = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)", 1)
    return F.lower(host)


def url_normalize(url: Column) -> Column:
    """Canonicalize a URL for exact-duplicate detection.

    Steps (each a single global regexp_replace, replayable in any engine):
      1. strip the fragment (``#...``)
      2. lower-case the scheme://authority prefix (path/query untouched —
         paths are case-sensitive per RFC 3986) and strip userinfo
      3. drop default ports ``:80`` / ``:443``
      4. remove tracking query params (utm_*, gclid, fbclid, …) and clean
         up dangling ``?`` / ``&``
      5. strip a trailing ``/``
    """
    u = F.regexp_replace(url, r"#.*$", "")  # 1. fragment
    auth = F.lower(F.regexp_extract(u, f"({_AUTHORITY})", 1))
    # 2b. strip userinfo — credentials never identify content (and must not
    # survive into a deduplication key)
    auth = F.regexp_replace(auth, r"^([a-z][a-z0-9+.-]*://)[^/@]*@", "$1")
    auth = F.regexp_replace(auth, r":(443|80)$", "")  # 3. default port
    rest = F.regexp_replace(u, _AUTHORITY, "")
    # 4. tracking params: lookbehind keeps real params like "xref=" intact
    rest = F.regexp_replace(rest, f"(?<=[?&])(?:{TRACKING_PARAMS})=[^&#]*&?", "")
    rest = F.regexp_replace(rest, r"[?&]+$", "")
    u = F.concat(auth, rest)
    return F.regexp_replace(u, r"/$", "")  # 5. trailing slash


def registered_domain(host: Column) -> Column:
    """Registrable domain of a hostname: last two labels, or last three
    when the suffix is a known second-level country suffix (co.uk, com.au,
    …).  Approximate public-suffix behavior with a frozen, documented rule
    so results are deterministic across engine versions."""
    three = F.regexp_extract(host, r"([^.]+\.[^.]+\.[^.]+)$", 1)
    two = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    is_sld = host.rlike(f"(^|\\.){_SLD_SUFFIX}$")
    return F.when(is_sld & (three != ""), three).otherwise(two)


def cap_per_domain(
    df: DataFrame,
    *,
    domain_col: str,
    n: int,
    order_by: str | Sequence[str],
    descending: bool = True,
) -> DataFrame:
    """Keep at most ``n`` rows per domain, preferring rows by ``order_by``
    (e.g. a quality score).  One shuffle on the domain key; the window never
    leaves its partition.  Ties are broken by the order column list itself —
    pass a unique id as the final key for full determinism."""
    cols = [order_by] if isinstance(order_by, str) else list(order_by)
    ordering = [F.col(c).desc() if descending else F.col(c).asc() for c in cols]
    w = Window.partitionBy(domain_col).orderBy(*ordering)
    return (
        df.withColumn("__dom_rn", F.row_number().over(w))
        .filter(F.col("__dom_rn") <= n)
        .drop("__dom_rn")
    )


def filter_blocked_domains(
    df: DataFrame, *, domain_col: str, blocked: Sequence[str]
) -> DataFrame:
    """Drop rows whose registered domain is on the blocklist.  The list is
    broadcast (it is always tiny relative to the corpus) so this is a
    map-side anti join — the corpus never shuffles."""
    spark = df.sparkSession
    bl = spark.createDataFrame([(d,) for d in blocked], f"{domain_col}: string")
    return df.join(F.broadcast(bl), on=domain_col, how="left_anti")


def domain_stats(df: DataFrame, *, domain_col: str) -> DataFrame:
    """Docs per domain and corpus share — the monitoring query behind
    per-domain caps.  One partial-aggregated shuffle; the total-row count
    rides in as a broadcast scalar (no single-partition window)."""
    counts = df.groupBy(domain_col).agg(F.count("*").alias("n_docs"))
    total = df.select(F.count("*").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            domain_col,
            "n_docs",
            (F.col("n_docs") / F.col("__total")).alias("share"),
        )
    )


# -- HTML text extraction (trafilatura/jusText's regexp-only little sibling;
# the C4/CCNet pipelines run exactly this class of tag-strip before any
# quality scoring when no DOM parser is available at corpus scale) ----------

_HTML_ENTITIES = [
    ("&nbsp;", " "),
    ("&amp;", "&"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
]


def html_to_text(html: Column) -> Column:
    """Plain text from raw HTML: drop script/style/comment blocks, turn
    block-level closers into newlines, strip remaining tags, decode the
    common entities, collapse whitespace.

    Pure ``regexp_replace`` chain — JVM-side, streams through the scan
    (projection only, no shuffle, no UDF).  Patterns avoid lookaround so
    the identical chain replays in RE2 (the DuckDB oracle replays it
    verbatim — web_html_to_text)."""
    c = html
    c = F.regexp_replace(c, r"(?is)<script[^>]*>.*?</script>", " ")
    c = F.regexp_replace(c, r"(?is)<style[^>]*>.*?</style>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"(?i)</(?:p|div|h[1-6]|li|tr|br)>", "\n")
    c = F.regexp_replace(c, r"(?i)<br[^>]*>", "\n")
    c = F.regexp_replace(c, r"<[^>]+>", " ")
    for ent, rep in _HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    c = F.regexp_replace(c, r"[ \t]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"\n{2,}", "\n")
    return F.trim(c)


def extract_links(html: Column) -> Column:
    """All href targets as an array column (the edge list of the crawl
    graph — feeding PageRank-ish link analysis or outlink-count quality
    signals).  regexp_extract_all, JVM-side."""
    return F.regexp_extract_all(html, F.lit(r'(?i)href="([^"#]+)'), 1)
