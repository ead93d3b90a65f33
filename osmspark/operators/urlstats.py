"""URL extraction + domain statistics — the C4/RefinedWeb-style
provenance-curation signals over a web-scale corpus: pull URLs out of
document text, parse them into host / registered domain / TLD / path
depth, aggregate per-domain corpus stats, and gate documents on a
domain block/allow list.

ALL native expressions: extraction is `regexp_extract_all` + one
`explode` (map-side — no shuffle until the caller aggregates), parsing
is Spark's JVM `parse_url` plus array ops over the host labels, the
stats are ONE groupBy with map-side combine (hot domains — the web's
Zipf head — are absorbed by partial aggregation because every agg here
is algebraic), and the domain gate broadcasts the list side.

Registered-domain extraction uses a DOCUMENTED built-in subset of
two-level public suffixes (`TWO_LEVEL_SUFFIXES`) rather than the full
Mozilla PSL (no network in this environment; a production deployment
swaps the constant for the PSL snapshot — the plan shape is identical:
the set folds into a codegen'd literal IN test over the last-two host
labels).  IPv4 hosts and single-label hosts (e.g. `localhost`) are
returned whole.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Minimal two-level public-suffix subset (documented contract — see module
# docstring).  Lowercase; compared against the joined last-two host labels.
TWO_LEVEL_SUFFIXES = [
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp", "com.br", "com.cn", "com.sg", "edu.sg",
    "gov.sg", "com.my", "co.in", "co.nz", "com.mx", "com.tr", "co.za",
]

# scheme://non-space run, then strip trailing sentence punctuation — the
# pragmatic web-text extractor.  The SAME pattern string is the pytest
# oracle's DuckDB regexp (both engines use RE2-compatible syntax here),
# so extraction parity is bit-exact by construction.
URL_PATTERN = r"https?://[^\s<>\"')\]]+"
_TRAIL_PUNCT = r"[.,;:!?]+$"


def extract_urls(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(id_col, url): every URL occurrence in the text, in order, with
    trailing sentence punctuation stripped.  Docs without URLs produce no
    rows (explode, not explode_outer — the stats consumers count docs via
    the URL rows; use a left join back to `docs` for has-no-url queries).
    Map-side only: no shuffle, no Python."""
    urls = F.regexp_extract_all(
        F.coalesce(F.col(text_col), F.lit("")), F.lit(URL_PATTERN), 0
    )
    return docs.select(
        F.col(id_col),
        F.explode(urls).alias("url"),
    ).withColumn("url", F.regexp_replace("url", _TRAIL_PUNCT, ""))


def registered_domain_col(host):
    """Registered domain of an (already-lowercased) host Column — the
    last two labels, or three when the last two are a listed two-level
    public suffix; IPv4 and single-label hosts pass through whole; NULL
    host -> NULL.  Shared by `url_parts` (URL dst side) and
    `pagerank.domain_authority` (source-domain side) so both endpoints
    of a link edge fold identically — an unfolded src ('www.site.com')
    against a folded dst ('site.com') would split one site into two
    graph nodes."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.slice(labels, n - 1, 2))
    last3 = F.concat_ws(".", F.slice(labels, n - 2, 3))
    is_ip = host.rlike(r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$")
    suffix_set = F.array(*[F.lit(s) for s in TWO_LEVEL_SUFFIXES])
    return (
        F.when(host.isNull(), F.lit(None).cast("string"))
        .when(is_ip | (n <= 1), host)
        .when((n >= 3) & F.array_contains(suffix_set, last2), last3)
        .otherwise(last2)
    )


def url_parts(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append protocol / host / registered_domain / tld / path_depth /
    has_query columns.  Host is lowercased (normalization contract —
    java.net.URI preserves case; DNS is case-insensitive).  Unparsable
    URLs yield NULL host and NULL-propagated parts, NOT dropped — the
    caller decides (domain_stats filters them; a quality gate may count
    them).  Pure codegen: parse_url + split + slice over the label array."""
    u = F.col(url_col)
    host = F.lower(F.parse_url(u, F.lit("HOST")))
    path = F.parse_url(u, F.lit("PATH"))
    labels = F.split(host, r"\.")
    is_ip = host.rlike(r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$")
    registered = registered_domain_col(host)
    tld = F.when(is_ip, F.lit(None).cast("string")).otherwise(
        F.element_at(labels, -1))
    path_depth = F.size(
        F.filter(F.split(F.coalesce(path, F.lit("")), "/"),
                 lambda s: s != "")
    )
    return df.select(
        "*",
        F.lower(F.parse_url(u, F.lit("PROTOCOL"))).alias("protocol"),
        host.alias("host"),
        registered.alias("registered_domain"),
        tld.alias("tld"),
        path_depth.alias("path_depth"),
        F.parse_url(u, F.lit("QUERY")).isNotNull().alias("has_query"),
    )


def domain_stats(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", exact: bool = True) -> DataFrame:
    """Per-registered-domain corpus stats: (registered_domain, n_urls,
    n_docs, n_hosts, avg_path_depth, query_frac).  Unparsable-host URLs
    are excluded.

    exact=True (default — the oracle-testable path): n_docs/n_hosts are
    exact multi-distinct counts, which Spark plans as an Expand (one
    input row per distinct agg) + two exchanges keyed on the domain —
    fine to ~10^9 URL rows.  exact=False is the web-scale path: HLL
    sketches (approx_count_distinct, ~2% rsd) keep the plan at ONE
    partial+final aggregate with ONE exchange, hot Zipf-head domains
    absorbed map-side."""
    parts = url_parts(extract_urls(docs, text_col, id_col))
    n_docs = (F.countDistinct(id_col) if exact
              else F.approx_count_distinct(id_col, 0.02))
    n_hosts = (F.countDistinct("host") if exact
               else F.approx_count_distinct("host", 0.02))
    return (
        parts.where(F.col("registered_domain").isNotNull())
        .groupBy("registered_domain")
        .agg(
            F.count("*").alias("n_urls"),
            n_docs.alias("n_docs"),
            n_hosts.alias("n_hosts"),
            F.avg("path_depth").alias("avg_path_depth"),
            F.avg(F.col("has_query").cast("double")).alias("query_frac"),
        )
    )


def filter_by_domain(docs: DataFrame, domains: DataFrame,
                     mode: str = "block", text_col: str = "text",
                     id_col: str = "doc_id",
                     domain_col: str = "registered_domain") -> DataFrame:
    """Gate documents on a domain list (the C4 badlist / curated-allowlist
    step).  mode='block': keep docs where NO extracted URL's registered
    domain is listed (docs with no URLs pass).  mode='allow': keep docs
    with AT LEAST ONE listed domain (docs with no URLs are dropped —
    provenance-unknown).  The list side is broadcast (a block/allow list
    is a dimension); the doc side is touched once: extract → parse →
    semi/anti join on the doc id."""
    if mode not in ("block", "allow"):
        raise ValueError(f"mode must be 'block' or 'allow', got {mode!r}")
    dim = F.broadcast(
        domains.select(F.lower(F.col(domain_col)).alias("__dom")).distinct()
    )
    parts = url_parts(extract_urls(docs, text_col, id_col))
    hit_docs = (
        parts.join(dim, parts["registered_domain"] == dim["__dom"], "semi")
        .select(id_col)
        .distinct()
    )
    how = "anti" if mode == "block" else "semi"
    return docs.join(hit_docs, id_col, how)
