"""Web-corpus curation gate queries (polars_spark.llm.web): URL
canonicalization, registered-domain extraction, per-domain caps, blocklist
filtering.

The documents table has no URL column, so each query synthesizes a
deterministic URL per doc (same arithmetic on both engines) covering the
messy variants the normalizer must handle: upper-case scheme/host, default
ports, tracking params (leading, adjacent, and mixed with real params),
fragments, trailing slashes, and second-level country suffixes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_spark.llm.web import (
    cap_per_domain,
    domain_stats,
    filter_blocked_domains,
    registered_domain,
    url_host,
    url_normalize,
)
from polars_spark.queries import query, table

# ---------------------------------------------------------------------------
# deterministic URL synthesis — Spark side
# ---------------------------------------------------------------------------


def _synth_url_spark():
    d = F.col("doc_id")
    scheme = F.when(d % 3 == 0, F.lit("HTTPS://")).otherwise(F.lit("https://"))
    host = (
        F.when(d % 7 == 0, F.concat(F.col("source"), F.lit(".News.co.uk")))
        .when(d % 7 == 1, F.concat(F.lit("Media."), F.col("source"), F.lit(".com.au")))
        .otherwise(
            F.concat(
                F.when(d % 3 == 0, F.lit("WWW.")).otherwise(F.lit("")),
                F.col("source"),
                F.lit(".Example.COM"),
            )
        )
    )
    port = F.when(d % 5 == 0, F.lit(":443")).otherwise(F.lit(""))
    path = F.concat(
        F.lit("/Articles/"),
        d.cast("string"),
        F.when(d % 4 == 0, F.lit("/")).otherwise(F.lit("")),
    )
    q = (
        F.when(d % 4 == 0, F.lit("?utm_source=feed&utm_medium=rss"))
        .when(d % 4 == 1, F.concat(F.lit("?id="), d.cast("string"), F.lit("&gclid=XYZ")))
        .when(
            d % 4 == 2,
            F.concat(F.lit("?xref=keep&utm_campaign=x&id="), (d % 9).cast("string")),
        )
        .otherwise(F.lit(""))
    )
    frag = F.when(d % 6 == 0, F.lit("#section-2")).otherwise(F.lit(""))
    return F.concat(scheme, host, port, path, q, frag)


# ---------------------------------------------------------------------------
# the same synthesis + normalization replayed in DuckDB SQL
# ---------------------------------------------------------------------------

_SYNTH_URL_SQL = """
  (CASE WHEN doc_id % 3 = 0 THEN 'HTTPS://' ELSE 'https://' END)
  || (CASE WHEN doc_id % 7 = 0 THEN source || '.News.co.uk'
           WHEN doc_id % 7 = 1 THEN 'Media.' || source || '.com.au'
           ELSE (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END)
                || source || '.Example.COM' END)
  || (CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END)
  || '/Articles/' || doc_id
  || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
  || (CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed&utm_medium=rss'
           WHEN doc_id % 4 = 1 THEN '?id=' || doc_id || '&gclid=XYZ'
           WHEN doc_id % 4 = 2 THEN '?xref=keep&utm_campaign=x&id=' || (doc_id % 9)
           ELSE '' END)
  || (CASE WHEN doc_id % 6 = 0 THEN '#section-2' ELSE '' END)
"""

_TRACK = "utm_[a-z0-9_]+|gclid|fbclid|msclkid|ref|mc_cid|mc_eid"
_AUTH = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"

# DuckDB's RE2 has no lookbehind, so the tracking-param strip uses the
# capture form applied TWICE (handles up to two adjacent tracking params —
# the synthesis above produces at most two; the Spark library version uses
# a lookbehind and handles any number in one pass).
_NORM_SQL = f"""
  regexp_replace(
    lower(regexp_replace(
        regexp_extract(regexp_replace(u, '#.*$', ''), '({_AUTH})', 1),
        ':(443|80)$', ''))
    || regexp_replace(
         regexp_replace(
           regexp_replace(
             regexp_replace(regexp_replace(u, '#.*$', ''), '{_AUTH}', ''),
             '([?&])(?:{_TRACK})=[^&#]*&?', '\\1', 'g'),
           '([?&])(?:{_TRACK})=[^&#]*&?', '\\1', 'g'),
         '[?&]+$', ''),
    '/$', '')
"""

_HOST_SQL = (
    "lower(regexp_extract(u, '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)', 1))"
)

_SLD = "(?:co|com|org|net|ac|gov|edu)\\.(?:uk|jp|au|in|br|cn|nz|za)"

_DOMAIN_SQL = f"""
  CASE WHEN regexp_matches(h, '(^|\\.){_SLD}$')
            AND regexp_extract(h, '([^.]+\\.[^.]+\\.[^.]+)$', 1) <> ''
       THEN regexp_extract(h, '([^.]+\\.[^.]+\\.[^.]+)$', 1)
       ELSE regexp_extract(h, '([^.]+\\.[^.]+)$', 1) END
"""


@query(
    "web_url_normalize",
    oracle=f"""
    WITH urls AS (
      SELECT doc_id, {_SYNTH_URL_SQL} AS u FROM documents
    ), hosted AS (
      SELECT doc_id, u, {_NORM_SQL} AS url_norm, {_HOST_SQL} AS h FROM urls
    )
    SELECT doc_id, u AS url_raw, url_norm, h AS host, {_DOMAIN_SQL} AS domain
    FROM hosted
    """,
)
def web_url_normalize(spark, sf_dir):
    """URL canonicalization + host + registered domain over every doc.
    Pure projection (regexp column algebra): pipelines into the scan, zero
    shuffles at any scale."""
    docs = table(spark, sf_dir, "documents")
    u = _synth_url_spark()
    host = url_host(F.col("url_raw"))
    return (
        docs.select("doc_id", u.alias("url_raw"))
        .select(
            "doc_id",
            "url_raw",
            url_normalize(F.col("url_raw")).alias("url_norm"),
            host.alias("host"),
            registered_domain(host).alias("domain"),
        )
    )


@query(
    "web_domain_cap",
    oracle=f"""
    WITH urls AS (
      SELECT doc_id, n_chars, {_SYNTH_URL_SQL} AS u FROM documents
    ), hosted AS (
      SELECT doc_id, n_chars, {_HOST_SQL} AS h FROM urls
    ), dom AS (
      SELECT doc_id, n_chars, {_DOMAIN_SQL} AS domain FROM hosted
    ), ranked AS (
      SELECT doc_id, domain,
             row_number() OVER (PARTITION BY domain
                                ORDER BY n_chars DESC, doc_id DESC) AS rn
      FROM dom
    )
    SELECT doc_id, domain FROM ranked WHERE rn <= 50
    """,
)
def web_domain_cap(spark, sf_dir):
    """RefinedWeb-style per-domain quota: keep the 50 longest docs per
    registered domain.  One shuffle on the domain key (partitioned window —
    never a global window)."""
    docs = table(spark, sf_dir, "documents")
    host = url_host(_synth_url_spark())
    with_dom = docs.select(
        "doc_id", "n_chars", registered_domain(host).alias("domain")
    )
    capped = cap_per_domain(
        with_dom, domain_col="domain", n=50, order_by=["n_chars", "doc_id"], descending=True
    )
    return capped.select("doc_id", "domain")


@query(
    "web_blocklist_stats",
    oracle=f"""
    WITH urls AS (
      SELECT doc_id, {_SYNTH_URL_SQL} AS u FROM documents
    ), hosted AS (
      SELECT doc_id, {_HOST_SQL} AS h FROM urls
    ), dom AS (
      SELECT doc_id, {_DOMAIN_SQL} AS domain FROM hosted
    ), kept AS (
      SELECT * FROM dom
      WHERE domain IS NULL OR domain NOT IN ('src0.example.com', 'news.co.uk')
    )
    SELECT domain, count(*) AS n_docs,
           floor(count(*) / (SELECT count(*) FROM kept) * 1000000 + 0.5) / 1000000 AS share
    FROM kept GROUP BY domain
    """,
)
def web_blocklist_stats(spark, sf_dir):
    """Blocklist anti-join (broadcast — the corpus never shuffles) feeding
    the per-domain share monitor (one agg shuffle + broadcast total)."""
    docs = table(spark, sf_dir, "documents")
    host = url_host(_synth_url_spark())
    with_dom = docs.select("doc_id", registered_domain(host).alias("domain"))
    kept = filter_blocked_domains(
        with_dom, domain_col="domain", blocked=["src0.example.com", "news.co.uk"]
    )
    stats = domain_stats(kept, domain_col="domain")
    return stats.select(
        "domain",
        "n_docs",
        (F.floor(F.col("share") * 1000000 + F.lit(0.5)) / 1000000).alias("share"),
    )


@query(
    "web_url_dedup",
    oracle=f"""
    WITH urls AS (
      SELECT doc_id, {_SYNTH_URL_SQL} AS u FROM documents
    ), norm AS (
      SELECT doc_id, {_NORM_SQL} AS url_norm FROM urls
    )
    SELECT url_norm, min(doc_id) AS keep_id, count(*) AS n_copies
    FROM norm GROUP BY url_norm
    """,
)
def web_url_dedup(spark, sf_dir):
    """Exact URL-level dedup AFTER canonicalization: syntactic variants
    (tracking params, case, ports, fragments) collapse to one canonical
    URL; keep the lowest doc id.  One hash-groupBy shuffle on the
    canonical form — the first stage of every crawl pipeline."""
    docs = table(spark, sf_dir, "documents")
    u = _synth_url_spark()
    return (
        docs.select("doc_id", url_normalize(u).alias("url_norm"))
        .groupBy("url_norm")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
    )


@query(
    "web_html_to_text",
    oracle="""
    WITH raw AS (
      SELECT doc_id,
             '<html><head><style>a{color:red}</style><SCRIPT>var x=1;</SCRIPT></head>'
             || '<body><h1>Doc ' || doc_id || '</h1><!-- c1 --><p>'
             || substr(text, 1, 120)
             || ' &amp; more &lt;stuff&gt;</p><BR/><a href="https://ex.com/p?id='
             || doc_id || '#f">link &quot;q&#39;s&quot;</a></body></html>' AS html
      FROM documents
    ), stripped AS (
      SELECT doc_id,
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(
                  regexp_replace(html, '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
                  '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
                '(?s)<!--.*?-->', ' ', 'g'),
              '(?i)</(?:p|div|h[1-6]|li|tr|br)>', chr(10), 'g'),
            '(?i)<br[^>]*>', chr(10), 'g'),
          '<[^>]+>', ' ', 'g') AS t,
        regexp_extract_all(html, '(?i)href="([^"#]+)', 1) AS links
      FROM raw
    ), decoded AS (
      SELECT doc_id, links,
        replace(replace(replace(replace(replace(replace(replace(t,
          '&nbsp;', ' '), '&amp;', '&'), '&lt;', '<'), '&gt;', '>'),
          '&quot;', '"'), '&#39;', ''''), '&apos;', '''') AS t
      FROM stripped
    )
    SELECT doc_id,
      trim(regexp_replace(
        regexp_replace(
          regexp_replace(t, '[ ' || chr(9) || ']+', ' ', 'g'),
          ' ?' || chr(10) || ' ?', chr(10), 'g'),
        chr(10) || '{2,}', chr(10), 'g')) AS text,
      links[1] AS first_link,
      len(links) AS n_links
    FROM decoded
    """,
)
def web_html_to_text(spark, sf_dir):
    """llm.web.html_to_text + extract_links: regexp-only HTML text
    extraction (tag/script/style/comment strip, entity decode, whitespace
    collapse) — a pure projection that pipelines into the scan; the oracle
    replays the identical chain in RE2."""
    from polars_spark.llm.web import extract_links, html_to_text

    docs = table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    html = F.concat(
        F.lit("<html><head><style>a{color:red}</style><SCRIPT>var x=1;</SCRIPT></head>"),
        F.lit("<body><h1>Doc "), d.cast("string"), F.lit("</h1><!-- c1 --><p>"),
        F.substring(F.col("text"), 1, 120),
        F.lit(' &amp; more &lt;stuff&gt;</p><BR/><a href="https://ex.com/p?id='),
        d.cast("string"), F.lit('#f">link &quot;q&#39;s&quot;</a></body></html>'),
    )
    out = docs.select(
        d.alias("doc_id"),
        html_to_text(html).alias("text"),
        F.element_at(extract_links(html), 1).alias("first_link"),
        F.size(extract_links(html)).alias("n_links"),
    )
    return out


@query(
    "web_pagerank",
    oracle="""
    WITH edges AS (
      SELECT DISTINCT u, v FROM (
        SELECT doc_id % 60 AS u, (doc_id * 7 + 3) % 60 AS v FROM documents
        UNION ALL
        SELECT doc_id % 60, (doc_id * 13 + 5) % 60 FROM documents
      ) WHERE u <> v
    ),
    nodes AS (SELECT DISTINCT u AS node FROM edges UNION SELECT DISTINCT v FROM edges),
    n AS (SELECT count(*)::DOUBLE AS n FROM nodes),
    deg AS (SELECT u, count(*)::DOUBLE AS deg FROM edges GROUP BY u),
    r0 AS (SELECT node, 1.0 / (SELECT n FROM n) AS rank FROM nodes),
    it1 AS (
      SELECT nodes.node,
             (1 - 0.85) / (SELECT n FROM n)
             + 0.85 * coalesce(sum(r0.rank / deg.deg), 0) AS rank
      FROM nodes
      LEFT JOIN edges ON edges.v = nodes.node
      LEFT JOIN deg ON deg.u = edges.u
      LEFT JOIN r0 ON r0.node = edges.u
      GROUP BY nodes.node
    ),
    it2 AS (
      SELECT nodes.node,
             (1 - 0.85) / (SELECT n FROM n)
             + 0.85 * coalesce(sum(it1.rank / deg.deg), 0) AS rank
      FROM nodes
      LEFT JOIN edges ON edges.v = nodes.node
      LEFT JOIN deg ON deg.u = edges.u
      LEFT JOIN it1 ON it1.node = edges.u
      GROUP BY nodes.node
    ),
    it3 AS (
      SELECT nodes.node,
             (1 - 0.85) / (SELECT n FROM n)
             + 0.85 * coalesce(sum(it2.rank / deg.deg), 0) AS rank
      FROM nodes
      LEFT JOIN edges ON edges.v = nodes.node
      LEFT JOIN deg ON deg.u = edges.u
      LEFT JOIN it2 ON it2.node = edges.u
      GROUP BY nodes.node
    )
    SELECT node, floor(rank * 1e9 + 0.5) / 1e9 AS rank FROM it3
    """,
)
def web_pagerank(spark, sf_dir):
    """llm.graph.pagerank: dataframe-native power iteration over a
    deterministic synthetic crawl graph (same arithmetic both engines);
    the oracle replays 3 supersteps as chained CTEs.  Dangling mass
    simplification identical on both sides."""
    from polars_spark.llm.graph import pagerank
    from polars_spark.queries import fround

    docs = table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    # both edge directions from ONE documents scan: explode of the two dst
    # expressions yields the same row multiset as the old 2-scan unionByName
    # (per doc: (src, 7d+3), (src, 13d+5)), and distinct dedups identically
    edges = (
        docs.select(
            (d % 60).alias("src"),
            F.explode(F.array((d * 7 + 3) % 60, (d * 13 + 5) % 60)).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    ranks = pagerank(edges, iters=3, damping=0.85)
    return ranks.select("node", fround(F.col("rank"), 9).alias("rank"))
