"""URL column functions + quota sampling + decontamination (round 3)."""

from pyspark.sql import functions as F

from pure_python_geospatial_export_spark.functions import urls as U
from pure_python_geospatial_export_spark.operators.curate import (
    decontaminate,
    ngram_contamination,
    quota_sample,
)
from pure_python_geospatial_export_spark.session import local_df

CASES = [
    ("https://user@www.Example.COM:8080/a/b/c.PDF?x=1",
     "www.example.com", "example.com", 3, "pdf", True),
    ("http://bbc.co.uk", "bbc.co.uk", "bbc.co.uk", 0, "", False),
    ("https://news.bbc.co.uk/article/1", "news.bbc.co.uk", "bbc.co.uk",
     2, "", False),
    ("https://a.b.c.example.org/x/", "a.b.c.example.org", "example.org",
     1, "", False),
    ("ftp://localhost/file.tar", "localhost", "localhost", 1, "tar",
     False),
    ("https://img.site.io/p/q/photo.JPG", "img.site.io", "site.io", 3,
     "jpg", True),
]


def test_url_functions(spark):
    df = local_df(spark, [(i, c[0]) for i, c in enumerate(CASES)],
                  ["i", "url"])
    host = U.url_host(F.col("url"))
    got = df.select(
        "i",
        host.alias("host"),
        U.registered_domain(host).alias("dom"),
        U.url_path_depth(F.col("url")).alias("depth"),
        U.url_extension(F.col("url")).alias("ext"),
        U.url_is_media(F.col("url")).alias("media"),
    ).orderBy("i").collect()
    for row, (_, h, d, dep, ext, media) in zip(got, CASES):
        assert row["host"] == h, row
        assert row["dom"] == d, row
        assert row["depth"] == dep, row
        assert row["ext"] == ext, row
        assert row["media"] == media, row


def test_url_sql_twins_match(spark):
    import duckdb

    df = local_df(spark, [(c[0],) for c in CASES], ["url"])
    host = U.url_host(F.col("url"))
    got = [
        tuple(r)
        for r in df.select(
            host, U.registered_domain(host),
            U.url_path_depth(F.col("url")).cast("long"),
            U.url_extension(F.col("url")),
            U.url_is_media(F.col("url")),
        ).collect()
    ]
    con = duckdb.connect()
    duck = con.sql(
        "SELECT %s AS h, %s AS d, %s AS dep, %s AS e, %s AS m "
        "FROM (SELECT unnest(%r) AS url)"
        % (
            U.url_host_sql("url"),
            U.registered_domain_sql(U.url_host_sql("url")),
            U.url_path_depth_sql("url"),
            U.url_extension_sql("url"),
            U.url_is_media_sql("url"),
            [c[0] for c in CASES],
        )
    ).fetchall()
    assert got == duck


def test_quota_sample_deterministic_and_capped(spark):
    rows = [(i, "dom%d" % (i % 3)) for i in range(300)]
    df = local_df(spark, rows, ["doc_id", "domain"])
    a = {
        r["doc_id"]
        for r in quota_sample(df, "domain", "doc_id", 15).collect()
    }
    b = {
        r["doc_id"]
        for r in quota_sample(
            df.repartition(13), "domain", "doc_id", 15
        ).collect()
    }
    assert a == b, "selection must be partitioning-invariant"
    assert len(a) == 45  # 3 domains x 15
    c = {
        r["doc_id"]
        for r in quota_sample(df, "domain", "doc_id", 15,
                              seed="other").collect()
    }
    assert c != a, "different seed must draw a different sample"
    assert len(c) == 45


def test_decontaminate_drops_overlap(spark):
    stem = " ".join("w%d" % i for i in range(20))
    rows = [
        (1, stem + " contaminated tail"),
        (2, "completely different words " + " ".join(
            "q%d" % i for i in range(20))),
        (3, stem + " another suffix here"),
    ]
    docs = local_df(spark, rows, ["doc_id", "text"])
    bench = local_df(spark, [(100, stem)], ["doc_id", "text"])
    scan = ngram_contamination(docs, bench, n=8).collect()
    flagged = {r["doc_id"]: r["contamination"] for r in scan}
    assert 1 in flagged and 3 in flagged and 2 not in flagged
    assert all(0 < v <= 1.0 for v in flagged.values())
    kept = decontaminate(docs, bench, n=8)
    assert {r["doc_id"] for r in kept.collect()} == {2}
    # threshold above the overlap keeps everything
    kept_all = decontaminate(docs, bench, n=8, max_contamination=1.0)
    assert kept_all.count() == 3
