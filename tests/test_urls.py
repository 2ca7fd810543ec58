"""URL filtering operators + the prepare_corpus URL stage.

Parity query: q60's url_host/url_domain/url_depth/url_keep columns
run the same operators against DuckDB regexp/list mirrors at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatabowl2024_25_spark.operators.urls import (
    filter_by_url,
    registered_domain,
    url_host,
    url_keep,
    url_path_depth,
    url_scheme,
)
from bigdatabowl2024_25_spark.pipelines.corpus import (
    CorpusConfig,
    prepare_corpus,
)

CASES = [
    # url, scheme, host, domain, depth
    ("https://example.com/a/b", "https", "example.com", "example.com", 2),
    ("http://www.Example.COM", "http", "www.example.com", "example.com", 0),
    ("https://a.b.news.co.uk:8080/x", "https", "a.b.news.co.uk", "news.co.uk", 1),
    ("ftp://files.example.org/pub", "ftp", "files.example.org", "example.org", 1),
    ("https://localhost/p", "https", "localhost", "localhost", 1),
    ("not a url at all", "", "", "", 0),
    ("https://deep.sub.host.example.com/a/b/c/d", "https",
     "deep.sub.host.example.com", "example.com", 4),
    # round 10: userinfo must never masquerade as the host — an
    # adversarial URL hides a blocked domain before '@' (or hides the
    # real host behind credentials); browser semantics say the host
    # starts after the LAST '@' in the authority
    ("https://blocked.com@evil.com/x", "https", "evil.com", "evil.com", 1),
    ("https://user:pw@site.example.com:8080/a", "https",
     "site.example.com", "example.com", 1),
    ("https://a@b@last.example.org/", "https", "last.example.org",
     "example.org", 1),
]


def test_url_parts(spark):
    df = spark.createDataFrame([(u,) for u, *_ in CASES], "url string")
    got = df.select(
        "url",
        url_scheme(F.col("url")).alias("s"),
        url_host(F.col("url")).alias("h"),
        registered_domain(url_host(F.col("url"))).alias("d"),
        url_path_depth(F.col("url")).alias("p"),
    ).collect()
    by_url = {r.url: (r.s, r.h, r.d, r.p) for r in got}
    for url, s, h, d, p in CASES:
        assert by_url[url] == (s, h, d, p), url


def test_url_keep_rules(spark):
    df = spark.createDataFrame(
        [
            ("https://ok.example.com/x", True),
            ("ftp://ok.example.com/x", False),  # scheme
            ("https://bad.example.net/x", False),  # blocked domain
            ("https://ok.example.com/spam/x", False),  # pattern
            # round 10: blocked domain hidden behind userinfo — the
            # real host IS blocked, credentials must not launder it
            ("https://ok.example.com@bad.example.net/x", False),
            # and an innocent host must not be blocked for carrying a
            # blocked domain as its username
            ("https://bad.example.net@ok.example.com/x", True),
        ],
        "url string, want boolean",
    )
    got = df.select(
        "want",
        url_keep(
            F.col("url"),
            blocked_domains=("example.net",),
            blocked_url_pattern="/spam/",
        ).alias("keep"),
    ).collect()
    assert all(r.keep == r.want for r in got)


def test_filter_by_url_blocklist_df(spark):
    docs = spark.createDataFrame(
        [
            (1, "https://a.good.com/x"),
            (2, "https://sub.banned.com/y"),
            (3, "https://banned.com/z"),
        ],
        "doc_id bigint, url string",
    )
    bl = spark.createDataFrame([("banned.com",)], "domain string")
    out = filter_by_url(docs, "url", blocked_domains_df=bl)
    assert [r.doc_id for r in out.collect()] == [1]
    assert out.columns == ["doc_id", "url"]


def test_prepare_corpus_url_stage_and_domain_cap(spark):
    rows = []
    for i in range(40):
        host = ["hub.com", "small.org"][i % 4 == 0]
        # 30 docs on hub.com, 10 on small.org
        rows.append(
            (i, f"https://{host}/p/{i}", f"doc body words {i} one two three four")
        )
    rows.append((90, "ftp://hub.com/p", "scheme drop one two three four five"))
    rows.append((91, "https://blocked.net/p", "domain drop one two three four"))
    df = spark.createDataFrame(rows, "doc_id bigint, url string, text string")
    cfg = CorpusConfig(
        url_col="url",
        url_blocked_domains=("blocked.net",),
        max_per_domain=5,
        near_dup=False,
    )
    out = prepare_corpus(df, cfg=cfg).collect()
    ids = {r.doc_id for r in out}
    assert 90 not in ids and 91 not in ids
    doms = {}
    for r in out:
        d = "hub.com" if "hub.com" in r.url else "small.org"
        doms[d] = doms.get(d, 0) + 1
    assert doms == {"hub.com": 5, "small.org": 5}
    # deterministic: same survivors on re-run with different partitioning
    out2 = prepare_corpus(df.repartition(7), cfg=cfg).collect()
    assert {r.doc_id for r in out2} == ids


def test_prepare_corpus_qcls_stage(spark):
    from bigdatabowl2024_25_spark.operators.quality_clf import (
        quantize_weights,
        token_bucket,
    )

    # weights that punish the word 'junk' and reward everything else:
    # find junk's bucket via the operator itself, then pin weights
    dim = 16
    b = (
        spark.range(1)
        .select(token_bucket(F.lit("junk"), dim).alias("b"))
        .collect()[0]
        .b
    )
    w = [1000000] * dim
    w[b] = -5000000
    rows = [
        (1, "clean words only here today", "https://ok.com/a"),
        (2, "junk junk junk junk junk junk", "https://ok.com/b"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, url string")
    cfg = CorpusConfig(
        qcls_weights=tuple(quantize_weights([x / 10**6 for x in w])),
        qcls_threshold=0.0,
        near_dup=False,
    )
    out = prepare_corpus(df, cfg=cfg).collect()
    assert [r.doc_id for r in out] == [1]
