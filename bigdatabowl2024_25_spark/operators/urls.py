"""URL / domain filtering — the RefinedWeb/C4 "stage 0" of a web
corpus pipeline.

Before any text-quality work, web pipelines drop documents by their
URL alone: scheme allow-list, domain blocklists (UT1-style category
lists), and per-domain caps so no single host dominates the corpus
(RefinedWeb §3.1 "URL filtering"; C4 applies a bad-words URL filter).
The reference has no web layer; this slots in beside the quality/
dedup operators as a first-class corpus stage.

Everything here is pure codegen — regexp extracts, a literal IN list
for the blocklist (or a broadcast join when the list outgrows a plan
literal), split/element_at for the eTLD+1 approximation. No UDFs, no
shuffles: URL filtering at 100 TB is a map over the scan, exactly
where a filter this cheap belongs (it runs FIRST so every later stage
sees fewer rows).

The registered-domain step approximates the public-suffix list with a
literal set of common two-level suffixes (`TWO_LEVEL_SUFFIXES`). The
real PSL is ~9k rules and changes monthly; production would pass its
current two-level/wildcard entries in — the mechanism (suffix-aware
last-2/last-3 label selection) is identical, and the parameter exists
precisely so the list is data, not code.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: common eTLD two-level suffixes; pass the full PSL set in production
TWO_LEVEL_SUFFIXES = (
    "co.uk",
    "org.uk",
    "gov.uk",
    "ac.uk",
    "com.au",
    "co.jp",
    "co.in",
    "com.br",
    "com.cn",
    "com.mx",
)

_SCHEME_RE = "^([a-z][a-z0-9+.-]*)://"
#: authority = [userinfo@]host[:port] — the optional group is greedy,
#: so the host starts after the LAST '@' in the authority (browser
#: semantics), and the host class excludes '@' outright. Without this
#: `https://blocked.com@evil.com/` would extract host
#: 'blocked.com@evil.com', whose registered domain matches no
#: blocklist entry — an adversarial bypass of domain blocking.
_HOST_RE = "^[a-z][a-z0-9+.-]*://(?:[^/?#]*@)?([^/:?#@]+)"
_PATH_RE = "^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)"


def url_scheme(url: Column) -> Column:
    """Lowercased scheme ('' when the value isn't a URL)."""
    return F.regexp_extract(F.lower(url), _SCHEME_RE, 1)


def url_host(url: Column) -> Column:
    """Lowercased hostname; userinfo and port stripped ('' when not a
    URL)."""
    return F.regexp_extract(F.lower(url), _HOST_RE, 1)


def url_path_depth(url: Column) -> Column:
    """Number of '/'-separated path segments (0 for bare hosts)."""
    path = F.regexp_extract(F.lower(url), _PATH_RE, 1)
    return (
        F.length(path) - F.length(F.regexp_replace(path, "/", ""))
    ).cast("bigint")


def registered_domain(
    host: Column,
    two_level_suffixes: tuple[str, ...] = TWO_LEVEL_SUFFIXES,
) -> Column:
    """eTLD+1: last two labels, or last three when the trailing pair
    is a listed two-level suffix (bbc.co.uk, not co.uk)."""
    parts = F.split(host, "\\.")
    n = F.size(parts)
    last2 = F.concat_ws(
        ".", F.element_at(parts, -2), F.element_at(parts, -1)
    )
    last3 = F.concat_ws(
        ".",
        F.element_at(parts, -3),
        F.element_at(parts, -2),
        F.element_at(parts, -1),
    )
    return (
        F.when((n >= 3) & last2.isin(*two_level_suffixes), last3)
        .when(n >= 2, last2)
        .otherwise(host)
    )


def url_keep(
    url: Column,
    *,
    blocked_domains: tuple[str, ...] = (),
    blocked_url_pattern: str | None = None,
    schemes: tuple[str, ...] = ("http", "https"),
    two_level_suffixes: tuple[str, ...] = TWO_LEVEL_SUFFIXES,
) -> Column:
    """Boolean keep-flag: scheme allowed, registered domain not
    blocked, URL free of the blocked pattern. Blocklists up to a few
    thousand entries belong in the plan as an IN literal (predicate-
    pushdown friendly); for UT1-scale lists (millions), anti-join a
    broadcast domain table instead — see `filter_by_url`."""
    keep = url_scheme(url).isin(*schemes)
    if blocked_domains:
        dom = registered_domain(url_host(url), two_level_suffixes)
        keep = keep & ~dom.isin(*blocked_domains)
    if blocked_url_pattern:
        keep = keep & ~F.lower(url).rlike(blocked_url_pattern)
    return keep


def filter_by_url(
    df: DataFrame,
    url_col: str,
    *,
    blocked_domains: tuple[str, ...] = (),
    blocked_domains_df: DataFrame | None = None,
    blocked_url_pattern: str | None = None,
    schemes: tuple[str, ...] = ("http", "https"),
) -> DataFrame:
    """Apply the URL stage. Small blocklists inline as a literal;
    a `blocked_domains_df` (one column `domain`) handles UT1-scale
    lists via a broadcast LEFT ANTI join on the registered domain —
    the corpus never shuffles either way.

    Per-domain caps (the other half of the RefinedWeb URL stage)
    compose with `sampling.stratified_fixed_k(df, by=[domain_col],
    k=cap)` — deterministic keyed-hash ranking, one shuffle."""
    out = df.filter(
        url_keep(
            F.col(url_col),
            blocked_domains=blocked_domains,
            blocked_url_pattern=blocked_url_pattern,
            schemes=schemes,
        )
    )
    if blocked_domains_df is not None:
        dom = registered_domain(url_host(F.col(url_col)))
        out = out.withColumn("__dom", dom).join(
            F.broadcast(blocked_domains_df.select(F.col("domain").alias("__dom"))),
            "__dom",
            "left_anti",
        ).drop("__dom")
    return out
