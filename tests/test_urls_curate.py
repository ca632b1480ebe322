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


# ---------------------------------------------------------------------------
# PII detection / redaction (functions/pii.py)
# ---------------------------------------------------------------------------

def test_pii_counts_and_redaction(spark):
    from pure_python_geospatial_export_spark.functions import pii as P
    from pure_python_geospatial_export_spark.session import local_df

    rows = [
        (1, "mail me at jo.doe+spam@sub.example.co.uk thanks"),
        (2, "server at 192.168.0.1 and 10.0.0.255 responded"),
        (3, "call +1 (555) 010-4477 or 555 0100 998 now"),
        (4, "clean text with the year 2024 and number 7"),
        (5, "a@b.io from 8.8.8.8 dial 555-0100-22"),
    ]
    df = local_df(spark, rows, ["id", "text"])
    t = __import__("pyspark.sql.functions", fromlist=["col"]).col("text")
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            P.email_count(t).alias("e"),
            P.ipv4_count(t).alias("i"),
            P.phone_count(t).alias("p"),
            P.pii_hit(t).alias("hit"),
            P.redact_pii(t).alias("red"),
        ).collect()
    }
    assert (out[1]["e"], out[1]["i"], out[1]["p"]) == (1, 0, 0)
    assert out[1]["red"] == "mail me at <EMAIL> thanks"
    assert (out[2]["e"], out[2]["i"]) == (0, 2)
    assert out[2]["red"] == "server at <IP> and <IP> responded"
    assert out[3]["e"] == 0 and out[3]["i"] == 0 and out[3]["p"] >= 1
    assert "<PHONE>" in out[3]["red"]
    assert "4477" not in out[3]["red"]
    assert (out[4]["e"], out[4]["i"], out[4]["p"]) == (0, 0, 0)
    assert out[4]["hit"] is False
    assert out[4]["red"] == rows[3][1]
    assert (out[5]["e"], out[5]["i"], out[5]["p"]) == (1, 1, 1)
    assert out[5]["red"] == "<EMAIL> from <IP> dial <PHONE>"
    assert all(out[i]["hit"] for i in (1, 2, 3, 5))


def test_pii_sql_twins_match_duckdb(spark):
    """The *_sql twins must compute the identical values in DuckDB —
    including on adversarial inputs (adjacent classes, greedy runs)."""
    import duckdb

    from pure_python_geospatial_export_spark.functions import pii as P
    from pure_python_geospatial_export_spark.session import local_df
    from pyspark.sql import functions as F

    rows = [
        (1, "a@b.io c@d.org 1.2.3.4 999.999.999.999 +44 20 7946 0958"),
        (2, "x 2024 2025 2026 2027 y"),  # year run = phone-ish, by design
        (3, "v6-ish 2001:db8::1 and 1.2.3.4.5 dotted-run"),
        (4, ""),
    ]
    df = local_df(spark, rows, ["id", "text"])
    t = F.col("text")
    got = {
        r["id"]: (r["e"], r["i"], r["p"], r["red"])
        for r in df.select(
            "id",
            P.email_count(t).alias("e"),
            P.ipv4_count(t).alias("i"),
            P.phone_count(t).alias("p"),
            P.redact_pii(t).alias("red"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE tt(id INT, text VARCHAR)")
    con.executemany("INSERT INTO tt VALUES (?, ?)", rows)
    want = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(
            "SELECT id, %s, %s, %s, %s FROM tt"
            % (
                P.email_count_sql("text"),
                P.ipv4_count_sql("text"),
                P.phone_count_sql("text"),
                P.redact_pii_sql("text"),
            )
        ).fetchall()
    }
    assert got == want


# ---------------------------------------------------------------------------
# repetition_stats (operators/curate.py)
# ---------------------------------------------------------------------------

def test_repetition_stats_known_values(spark):
    from pure_python_geospatial_export_spark.operators.curate import (
        repetition_stats,
    )
    from pure_python_geospatial_export_spark.session import local_df

    rows = [
        (1, "spam spam spam spam"),          # "spam spam" x3 of 3 slots
        (2, "a b a b c"),                    # "a b" x2 of 4 slots
        (3, "all words here differ fully"),  # every bigram unique
        (4, "solo"),                         # < n tokens
    ]
    df = local_df(spark, rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert out[1]["n_tokens"] == 4
    assert out[1]["n_distinct_tokens"] == 1
    assert out[1]["top_gram_count"] == 3
    assert out[1]["top_gram_frac"] == 1.0
    assert out[1]["distinct_ratio"] == 0.25
    assert out[2]["top_gram_count"] == 2
    assert out[2]["top_gram_frac"] == 0.5
    assert out[3]["top_gram_count"] == 1
    assert out[3]["top_gram_frac"] == 0.25
    assert out[3]["distinct_ratio"] == 1.0
    assert out[4]["top_gram_count"] == 0
    assert out[4]["top_gram_frac"] == 0.0
    assert out[4]["distinct_ratio"] == 1.0
    assert len(out) == 4


def test_repetition_stats_trigram(spark):
    from pure_python_geospatial_export_spark.operators.curate import (
        repetition_stats,
    )
    from pure_python_geospatial_export_spark.session import local_df

    df = local_df(
        spark,
        [(1, "x y z x y z x y z"), (2, "a b")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in repetition_stats(df, n=3).collect()}
    # 7 trigram slots; "x y z" occurs 3 times
    assert out[1]["top_gram_count"] == 3
    assert out[1]["top_gram_frac"] == 3.0 / 7.0
    # 2 tokens < n=3 -> gram columns zero out
    assert out[2]["top_gram_count"] == 0
    assert out[2]["top_gram_frac"] == 0.0


# ---------------------------------------------------------------------------
# pack_sequences (operators/pack.py)
# ---------------------------------------------------------------------------

def test_pack_sequences_greedy_semantics(spark):
    from pure_python_geospatial_export_spark.operators.pack import (
        pack_sequences,
        packing_efficiency,
    )
    from pure_python_geospatial_export_spark.session import local_df

    # (shard, id, n_tokens) with a pre-counted token column
    rows = [
        ("a", 1, 40), ("a", 2, 60),   # 40+60=100 == cap: same bin
        ("a", 3, 1),                  # would make 101 -> new bin
        ("a", 4, 150),                # overlong -> own bin, overflow
        ("a", 5, 99),                 # next bin
        ("b", 1, 100),                # exact-capacity single doc
        ("b", 2, 100),
    ]
    df = local_df(spark, rows, ["source", "doc_id", "nt"])
    out = {
        (r["source"], r["doc_id"]):
            (r["pack_id"], r["pack_offset"], r["overflow"])
        for r in pack_sequences(df, 100, tokens_col="nt").collect()
    }
    assert out[("a", 1)] == (0, 0, False)
    assert out[("a", 2)] == (0, 40, False)   # fill+60 == cap joins
    assert out[("a", 3)] == (1, 0, False)
    assert out[("a", 4)] == (2, 0, True)     # overlong: own bin
    assert out[("a", 5)] == (3, 0, False)
    assert out[("b", 1)] == (0, 0, False)
    assert out[("b", 2)] == (1, 0, False)

    eff = {
        r["source"]: (r["n_bins"], r["n_tokens"], r["fill_fraction"])
        for r in packing_efficiency(
            pack_sequences(df, 100, tokens_col="nt"), 100
        ).collect()
    }
    assert eff["a"] == (4, 350, 350 / 400)
    assert eff["b"] == (2, 200, 1.0)


def test_pack_sequences_partitioning_invariant(spark):
    """The assignment is a pure function of (shard, id, n_tokens) —
    repartitioning the input must not change a single row."""
    from pure_python_geospatial_export_spark.operators.pack import (
        pack_sequences,
    )
    from pure_python_geospatial_export_spark.session import local_df

    import random
    rnd = random.Random(9)
    rows = [
        ("s%d" % (i % 5), i, rnd.randint(5, 120)) for i in range(400)
    ]
    df = local_df(spark, rows, ["source", "doc_id", "nt"])
    a = sorted(
        map(tuple, pack_sequences(df, 128, tokens_col="nt").collect())
    )
    b = sorted(
        map(tuple, pack_sequences(
            df.repartition(13), 128, tokens_col="nt"
        ).collect())
    )
    assert a == b
    # every non-overflow bin respects the capacity
    import collections
    fill = collections.Counter()
    for source, doc_id, nt, pack_id, off, overflow in a:
        fill[(source, pack_id)] += nt
        assert off + nt <= 128 or overflow
    for (source, pack_id), tot in fill.items():
        assert tot <= 128 or tot == max(
            nt for s, d, nt, p, o, ov in a
            if s == source and p == pack_id
        )


def test_pack_sequences_rejects_bad_capacity(spark):
    from pure_python_geospatial_export_spark.operators.pack import (
        pack_sequences,
    )
    from pure_python_geospatial_export_spark.session import local_df

    df = local_df(spark, [("a", 1, 5)], ["source", "doc_id", "nt"])
    import pytest
    with pytest.raises(ValueError):
        pack_sequences(df, 0, tokens_col="nt")


# ---------------------------------------------------------------------------
# tfidf_top_terms (operators/curate.py)
# ---------------------------------------------------------------------------

def test_tfidf_top_terms_known_values(spark):
    import math

    from pure_python_geospatial_export_spark.operators.curate import (
        tfidf_top_terms,
    )
    from pure_python_geospatial_export_spark.session import local_df

    rows = [
        (1, "apple apple banana"),
        (2, "banana banana banana"),
        (3, "cherry"),
    ]
    df = local_df(spark, rows, ["doc_id", "text"])
    got = {
        (r["doc_id"], r["rank"]): (r["term"], r["tf"], r["score"])
        for r in tfidf_top_terms(df, k=2).collect()
    }

    def score(tf, dfreq, n=3):
        return round(tf * (math.log((n + 1.0) / (dfreq + 1.0)) + 1.0), 9)

    # df: apple 1, banana 2, cherry 1
    assert got[(1, 1)] == ("apple", 2, score(2, 1))
    assert got[(1, 2)] == ("banana", 1, score(1, 2))
    assert got[(2, 1)] == ("banana", 3, score(3, 2))
    assert got[(3, 1)] == ("cherry", 1, score(1, 1))
    assert len(got) == 4  # k=2 caps doc 1; docs 2/3 have 1 term each


def test_tfidf_tie_breaks_on_term(spark):
    from pure_python_geospatial_export_spark.operators.curate import (
        tfidf_top_terms,
    )
    from pure_python_geospatial_export_spark.session import local_df

    # both terms appear once in this doc and once in the corpus ->
    # identical scores; rank must follow term ascending
    df = local_df(spark, [(1, "zeta alpha")], ["doc_id", "text"])
    got = [
        (r["rank"], r["term"])
        for r in tfidf_top_terms(df, k=2)
        .orderBy("rank").collect()
    ]
    assert got == [(1, "alpha"), (2, "zeta")]


def test_tfidf_df_pruning_removes_stopword_hot_key(spark):
    """min_df/max_df_frac prune the vocabulary BEFORE the term join:
    a 'the'-style token present in most docs (the skewed join key at
    web scale) disappears from both the join input and the output,
    and surviving scores are unchanged vs the unpruned run."""
    from pure_python_geospatial_export_spark.operators.curate import (
        tfidf_top_terms,
    )
    from pure_python_geospatial_export_spark.session import local_df

    # 'the': 8/10 docs (hot key); 'mid': 3/10; 'u<i>': unique per doc
    rows = [
        (i,
         ("the " if i < 8 else "")
         + ("mid " if i < 3 else "")
         + "u%d" % i)
        for i in range(10)
    ]
    df = local_df(spark, rows, ["doc_id", "text"])

    pruned = tfidf_top_terms(df, k=10, min_df=2, max_df_frac=0.5)
    got = [(r["doc_id"], r["term"], r["score"])
           for r in pruned.collect()]
    terms = {t for _, t, _ in got}
    assert "the" not in terms          # max_df prune (df=8 > 0.5*10)
    assert "u0" not in terms           # min_df prune (df=1 < 2)
    assert terms == {"mid"}            # df=3 survives both cuts

    # scores of surviving terms match the unpruned run exactly
    base = {(r["doc_id"], r["term"]): r["score"]
            for r in tfidf_top_terms(df, k=10).collect()}
    for doc, term, score in got:
        assert base[(doc, term)] == score

    # the join input (pruned vocabulary) demonstrably shrank
    import pyspark.sql.functions as F
    full_vocab = (
        tfidf_top_terms(df, k=10**6)
        .select("term").distinct().count()
    )
    pruned_vocab = pruned.select("term").distinct().count()
    assert pruned_vocab < full_vocab


def test_pii_cross_engine_fuzz(spark):
    """2000 adversarial random strings, one Spark job vs one DuckDB
    query: counts and redacted text must agree on every row — evidence
    the patterns really live in the Java-regex/RE2 common subset."""
    import random

    import duckdb

    from pure_python_geospatial_export_spark.functions import pii as P
    from pure_python_geospatial_export_spark.session import local_df
    from pyspark.sql import functions as F

    rnd = random.Random(42)
    alpha = "ab.Z0129@._%+-() :\t/";

    def rand_str():
        return "".join(
            rnd.choice(alpha) for _ in range(rnd.randrange(0, 60))
        )

    def emailish():
        return "%s@%s.%s" % (
            rand_str()[:8] or "x",
            rnd.choice(["ex.co", "a", "b-c", "9"]),
            "t" * rnd.randrange(1, 4),
        )

    def ipish():
        return ".".join(
            str(rnd.randrange(0, 10 ** rnd.randrange(1, 5)))
            for _ in range(rnd.randrange(3, 6))
        )

    def phoneish():
        return "+" * rnd.randrange(0, 2) + "".join(
            rnd.choice("0123456789- ()")
            for _ in range(rnd.randrange(4, 16))
        )

    rows = []
    for i in range(2000):
        kind = i % 4
        if kind == 0:
            s = rand_str()
        elif kind == 1:
            s = rand_str() + emailish() + rand_str()
        elif kind == 2:
            s = ipish() + " " + rand_str() + phoneish()
        else:
            s = emailish() + ipish() + phoneish()
        rows.append((i, s))

    df = local_df(spark, rows, ["id", "text"])
    t = F.col("text")
    got = {
        r["id"]: (r["e"], r["i"], r["p"], r["red"])
        for r in df.select(
            "id",
            P.email_count(t).alias("e"),
            P.ipv4_count(t).alias("i"),
            P.phone_count(t).alias("p"),
            P.redact_pii(t).alias("red"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE fz(id INT, text VARCHAR)")
    con.executemany("INSERT INTO fz VALUES (?, ?)", rows)
    want = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(
            "SELECT id, %s, %s, %s, %s FROM fz"
            % (
                P.email_count_sql("text"),
                P.ipv4_count_sql("text"),
                P.phone_count_sql("text"),
                P.redact_pii_sql("text"),
            )
        ).fetchall()
    }
    mismatches = {
        i: (got[i], want[i]) for i in got if got[i] != want[i]
    }
    assert not mismatches, list(mismatches.items())[:5]
    # the fixture actually exercises the patterns
    assert sum(1 for v in got.values() if v[0] > 0) > 100
    assert sum(1 for v in got.values() if v[1] > 0) > 100
    assert sum(1 for v in got.values() if v[2] > 0) > 100


# ---------------------------------------------------------------------------
# weighted_sample (operators/curate.py)
# ---------------------------------------------------------------------------

def _es_pick(keys, weights, k, seed=""):
    """Pure-python mirror of the Efraimidis-Spirakis hash formula."""
    import hashlib

    scored = []
    for key, w in zip(keys, weights):
        if w is None or w <= 0:
            continue
        h = int(hashlib.md5(
            ("%s%s" % (key, seed)).encode()
        ).hexdigest()[:8], 16)
        u = (h + 1.0) / 4294967297.0
        scored.append((round(u ** (1.0 / w), 12), -key))
    scored.sort(reverse=True)
    return {int(-nk) for _sc, nk in scored[:k]}


def test_weighted_sample_matches_python_mirror(spark):
    import random

    from pure_python_geospatial_export_spark.operators.curate import (
        weighted_sample,
    )
    from pure_python_geospatial_export_spark.session import local_df

    rnd = random.Random(3)
    rows = [
        ("g%d" % (i % 3), i, float(rnd.choice([0.5, 1.0, 5.0, 25.0])))
        for i in range(600)
    ]
    # plant degenerate weights that must be excluded
    rows += [("g0", 1000, 0.0), ("g1", 1001, -2.0)]
    df = local_df(spark, rows, ["grp", "key", "w"])
    got = {
        (r["grp"], r["key"])
        for r in weighted_sample(
            df, "key", "w", k=10, group_cols=["grp"]
        ).collect()
    }
    want = set()
    for g in ("g0", "g1", "g2"):
        sub = [(key, w) for grp, key, w in rows if grp == g]
        picked = _es_pick([key for key, _ in sub],
                          [w for _, w in sub], 10)
        want |= {(g, key) for key in picked}
    assert got == want
    assert len(got) == 30
    assert not {k for _, k in got} & {1000, 1001}


def test_weighted_sample_inclusion_tracks_weight():
    """Across seeds, heavy keys must be drawn far more often — the
    whole point of weight-proportional sampling (pure-python mirror:
    the Spark path computes the identical formula, pinned above)."""
    keys = list(range(200))
    weights = [10.0 if key < 20 else 1.0 for key in keys]
    heavy_hits = light_hits = 0
    for s in range(150):
        picked = _es_pick(keys, weights, 20, seed="s%d" % s)
        heavy_hits += sum(1 for key in picked if key < 20)
        light_hits += sum(1 for key in picked if key >= 20)
    # 20 heavy (w=10) vs 180 light (w=1): heavy expected inclusion
    # rate per key is ~5x the light rate; demand at least 3x
    heavy_rate = heavy_hits / (150 * 20)
    light_rate = light_hits / (150 * 180)
    assert heavy_rate > 3 * light_rate, (heavy_rate, light_rate)


def test_remove_boilerplate_lines(spark):
    """Lines shared by >= min_docs docs vanish from every doc; unique
    lines survive in order; an all-boilerplate doc becomes '' (not
    dropped); stats count removed lines."""
    from pure_python_geospatial_export_spark.operators.curate import (
        remove_boilerplate_lines,
    )
    from pure_python_geospatial_export_spark.session import local_df

    footer = "(c) example.com - all rights reserved"
    nav = "home | about | contact"
    rows = [
        (1, "unique body one\n%s\n%s" % (nav, footer)),
        (2, "%s\nunique body two\nsecond line two\n%s" % (nav, footer)),
        (3, "%s\n%s" % (nav, footer)),            # pure boilerplate
        (4, "standalone document, no chrome"),
        (5, "repeated inside\nrepeated inside\nunique tail"),
    ]
    df = local_df(spark, rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_removed"])
        for r in remove_boilerplate_lines(df).collect()
    }
    assert got[1] == ("unique body one", 3, 2)
    assert got[2] == ("unique body two\nsecond line two", 4, 2)
    assert got[3] == ("", 2, 2)
    assert got[4] == ("standalone document, no chrome", 1, 0)
    # duplicate WITHIN one doc is not cross-doc boilerplate
    assert got[5] == (
        "repeated inside\nrepeated inside\nunique tail", 3, 0
    )
    # higher threshold keeps everything (footer appears in 3 docs)
    loose = {
        r["doc_id"]: r["n_removed"]
        for r in remove_boilerplate_lines(df, min_docs=4).collect()
    }
    assert all(v == 0 for v in loose.values())

    # round-5 advice: blank / whitespace-only lines are paragraph
    # STRUCTURE, never boilerplate, even when every doc has one —
    # stripping them would collapse all paragraph separation
    para_rows = [
        (1, "para one\n\npara two\n%s" % footer),
        (2, "intro\n\nbody\n \nmore\n%s" % footer),
        (3, "alpha\n\nomega\n%s" % footer),
    ]
    pdf = local_df(spark, para_rows, ["doc_id", "text"])
    pgot = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in remove_boilerplate_lines(pdf, min_docs=3).collect()
    }
    assert pgot[1] == ("para one\n\npara two", 1)
    assert pgot[2] == ("intro\n\nbody\n \nmore", 1)
    assert pgot[3] == ("alpha\n\nomega", 1)


def test_char_lm_counts_known_values(spark):
    from pure_python_geospatial_export_spark.operators.curate import (
        char_lm_counts,
    )
    from pure_python_geospatial_export_spark.session import local_df

    # 'ab ab' normalizes to itself; padded '##ab ab' ->
    # grams ##a #ab ab_ b_a _ab (with _ = space)
    ref = local_df(spark, [(1, "ab AB")], ["doc_id", "text"])
    got = {
        r["gram"]: (r["c_gram"], r["c_ctx"])
        for r in char_lm_counts(ref).collect()
    }
    assert got["##a"] == (1, 1)
    assert got["#ab"] == (1, 1)
    # trailing 'ab' has no following char, so ctx 'ab' continues once
    assert got["ab "] == (1, 1)
    assert got["b a"] == (1, 1)
    assert got[" ab"] == (1, 1)


def test_perplexity_orders_reflike_before_gibberish(spark):
    import math

    from pure_python_geospatial_export_spark.operators.curate import (
        char_lm_counts,
        perplexity_score,
    )
    from pure_python_geospatial_export_spark.session import local_df

    ref_rows = [
        (i, "the quick brown fox jumps over the lazy dog again and "
            "again with more of the same words the fox the dog")
        for i in range(5)
    ]
    model = char_lm_counts(
        local_df(spark, ref_rows, ["doc_id", "text"])
    )
    docs = local_df(spark, [
        (1, "the quick brown fox"),
        (2, "zxqj vvkp wqxz jjzz"),
        (3, ""),
    ], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in
           perplexity_score(docs, model).collect()}
    # bits per char: ref-like text far cheaper than gibberish
    ppl = {
        i: math.exp(got[i]["cost_milli"] / got[i]["n_grams"] / 1e6)
        for i in (1, 2)
    }
    assert ppl[1] < ppl[2] / 3, ppl
    assert got[2]["n_oov"] > 0
    assert got[1]["n_oov"] == 0
    # empty doc scores zero grams, present in output
    assert (got[3]["n_grams"], got[3]["cost_milli"],
            got[3]["n_oov"]) == (0, 0, 0)


def test_curate_corpus_boilerplate_and_lm_stages(spark):
    """The optional round-4 stages compose into the preset: chrome is
    stripped before quality/dedup, and the perplexity ceiling drops
    gibberish while ref-like docs survive. Defaults-off behavior is
    pinned by the curate_pipeline oracle."""
    from pure_python_geospatial_export_spark.operators.curate import (
        curate_corpus,
    )
    from pure_python_geospatial_export_spark.session import local_df

    footer = "all rights reserved contact us cookie notice"
    body = ("the quick brown fox jumps over the lazy dog with many "
            "ordinary english words appearing in a normal order")
    rows = [
        (1, body + "\n" + footer),
        (2, body + " and a little extra text here\n" + footer),
        (3, "zxqj vvkp wqxz jjzz qqpp zzxx wwqq ppll kkjj hhgg\n"
            + footer),
        (4, footer),  # pure chrome -> empty after strip -> dropped
    ]
    df = local_df(spark, rows, ["doc_id", "text"])
    ref = local_df(
        spark,
        [(100 + i, body + " plus reference text %d" % i)
         for i in range(4)],
        ["doc_id", "text"],
    )
    kept = curate_corpus(
        df,
        min_quality=0.0,
        near_dup_threshold=None,
        min_tokens=3,
        boilerplate_min_docs=3,
        lm_ref=ref,
        max_ppl_cost_milli=2_500_000,  # ~e^2.5 per-char ceiling
    )
    ids = {r["doc_id"] for r in kept.collect()}
    assert 1 in ids and 2 in ids      # ref-like, chrome stripped
    assert 3 not in ids               # gibberish fails the LM gate
    assert 4 not in ids               # nothing left after stripping
    texts = {r["doc_id"]: r["text"] for r in kept.collect()}
    assert footer not in texts[1] and footer not in texts[2]


def test_chunk_documents_coverage_and_overlap(spark):
    from pure_python_geospatial_export_spark.operators.pack import (
        chunk_documents,
    )
    from pure_python_geospatial_export_spark.session import local_df

    toks = ["t%d" % i for i in range(10)]
    df = local_df(spark, [
        (1, " ".join(toks)),
        (2, "short doc"),
    ], ["doc_id", "text"])

    got = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(df, chunk_tokens=4).collect()
    }
    assert got[(1, 0)] == ("t0 t1 t2 t3", 4)
    assert got[(1, 1)] == ("t4 t5 t6 t7", 4)
    assert got[(1, 2)] == ("t8 t9", 2)
    assert got[(2, 0)] == ("short doc", 2)
    assert len([k for k in got if k[0] == 1]) == 3

    # overlap: stride 3, windows [0:4), [3:7), [6:10)
    ov = {
        r["chunk_idx"]: r["chunk_text"]
        for r in chunk_documents(
            df.where("doc_id = 1"), chunk_tokens=4, overlap=1
        ).collect()
    }
    assert ov == {0: "t0 t1 t2 t3", 1: "t3 t4 t5 t6", 2: "t6 t7 t8 t9"}

    import pytest

    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=4, overlap=4).collect()


def test_mixture_sample_hits_targets(spark):
    from pure_python_geospatial_export_spark.operators.curate import (
        mixture_sample,
    )
    from pure_python_geospatial_export_spark.session import local_df

    rows = [(i, ("a", "b", "c")[i % 3]) for i in range(300)]
    df = local_df(spark, rows, ["doc_id", "grp"])
    kept = mixture_sample(
        df, "grp", "doc_id", {"a": 0.5, "b": 0.3}, total=100,
        default_frac=0.1,
    )
    by_grp = {}
    for r in kept.collect():
        by_grp.setdefault(r["grp"], set()).add(r["doc_id"])
    assert {g: len(s) for g, s in by_grp.items()} == {
        "a": 50, "b": 30, "c": 10,
    }
    # partitioning invariance
    again = mixture_sample(
        df.repartition(17), "grp", "doc_id", {"a": 0.5, "b": 0.3},
        total=100, default_frac=0.1,
    )
    assert {
        (r["grp"], r["doc_id"]) for r in again.collect()
    } == {(g, d) for g, s in by_grp.items() for d in s}
    # under-populated group contributes what it has
    small = mixture_sample(
        df.where("grp = 'c'"), "grp", "doc_id", {"c": 1.0},
        total=1000,
    )
    assert small.count() == 100


def test_nfc_normalize_cross_engine_fuzz(spark):
    """unicodedata.normalize('NFC') (the Spark kernel) must agree with
    DuckDB's nfc_normalize byte-for-byte on adversarial combining
    sequences, Hangul jamo, and random BMP soup."""
    import random
    import unicodedata

    import duckdb

    from pure_python_geospatial_export_spark.functions.text import (
        nfc_normalize,
        nfc_normalize_sql,
    )
    from pure_python_geospatial_export_spark.session import local_df

    rnd = random.Random(99)
    pool = (
        "é à ö ñ éè Å "
        "각 각 ṩ ṩ "
        "plain ascii 123 ß Å Å"
    ).split(" ")
    rows = []
    for i in range(500):
        n = rnd.randrange(0, 8)
        rows.append((i, " ".join(rnd.choice(pool) for _ in range(n))))
    # hand-picked adversaries: NFC is NOT the identity on these
    rows += [
        (1000, "é"),           # e + combining acute -> é
        (1001, "Å"),            # ANGSTROM SIGN -> Å
        (1002, "각"),  # jamo -> precomposed syllable
        (1003, "ṩ"),     # combining reorder
        (1004, ""),
    ]
    assert any(
        unicodedata.normalize("NFC", t) != t for _, t in rows
    ), "fixture must exercise non-identity normalization"

    df = local_df(spark, rows, ["id", "text"])
    got = {
        r["id"]: r["norm"]
        for r in df.select(
            "id", nfc_normalize(F.col("text")).alias("norm")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE tt(id INT, text VARCHAR)")
    con.executemany("INSERT INTO tt VALUES (?, ?)", rows)
    want = {
        r[0]: r[1]
        for r in con.execute(
            "SELECT id, %s FROM tt" % nfc_normalize_sql("text")
        ).fetchall()
    }
    assert got == want
    assert got[1000] == "é"


def test_remove_duplicate_spans(spark):
    """Lee-et-al-style exact span dedup: an 8-gram window shared by >=
    min_docs docs is cut from EVERY doc wherever it appears; unique
    text survives in order; sub-ngram docs untouched; a fully-shared
    doc becomes ''."""
    import pytest

    from pure_python_geospatial_export_spark.operators.curate import (
        remove_duplicate_spans,
    )
    from pure_python_geospatial_export_spark.session import local_df

    passage = "one two three four five six seven eight"  # exactly 8
    rows = [
        (1, "intro alpha %s outro alpha" % passage),
        (2, "start beta %s end beta" % passage),
        (3, "%s" % passage),                       # fully shared -> ""
        (4, "short doc only"),                     # < ngram: untouched
        (5, "totally unrelated text with plenty of distinct tokens"),
    ]
    df = local_df(spark, rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
        for r in remove_duplicate_spans(
            df, ngram=8, min_docs=3
        ).collect()
    }
    assert got[1] == ("intro alpha outro alpha", 12, 8)
    assert got[2] == ("start beta end beta", 12, 8)
    assert got[3] == ("", 8, 8)
    assert got[4] == ("short doc only", 3, 0)
    assert got[5][2] == 0

    # min_docs above the family size keeps everything
    loose = {
        r["doc_id"]: r["n_removed"]
        for r in remove_duplicate_spans(
            df, ngram=8, min_docs=4
        ).collect()
    }
    assert all(v == 0 for v in loose.values())

    # overlapping coverage: two hot windows sharing tokens remove the
    # UNION of their positions, not double-count
    p9 = passage + " nine"
    rows2 = [(i, "head%d %s tail%d" % (i, p9, i)) for i in range(3)]
    got2 = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in remove_duplicate_spans(
            local_df(spark, rows2, ["doc_id", "text"]),
            ngram=8, min_docs=3,
        ).collect()
    }
    for i in range(3):
        assert got2[i] == ("head%d tail%d" % (i, i), 9)

    with pytest.raises(ValueError, match="ngram"):
        remove_duplicate_spans(df, ngram=1)


def test_curate_corpus_span_stage(spark):
    """span_ngram wires duplicate-span removal into the preset: the
    shared passage is cut before quality/dedup stages, so two docs
    identical except for the passage now collapse in exact dedup."""
    from pure_python_geospatial_export_spark.operators.curate import (
        curate_corpus,
    )
    from pure_python_geospatial_export_spark.session import local_df

    passage = "one two three four five six seven eight"
    body = ("real content alpha beta gamma delta epsilon zeta eta "
            "theta iota kappa")
    rows = [
        (1, "%s %s" % (body, passage)),
        (2, "%s %s" % (passage, body)),   # same body, passage moved
        (3, "%s other real content entirely different here ok fine "
            "good yes" % passage),
        (4, "tiny"),                      # fails the token floor
    ]
    df = local_df(spark, rows, ["doc_id", "text"])
    kept = curate_corpus(
        df, min_quality=0.0, near_dup_threshold=None, min_tokens=5,
        span_ngram=8, span_min_docs=3,
    )
    got = {r["doc_id"]: r["text"] for r in kept.collect()}
    # docs 1 and 2 both reduce to `body` -> exact dedup keeps min id
    assert set(got) == {1, 3}
    assert got[1] == body
    assert passage.split()[0] not in got[3].split()[:1]  # passage gone
    assert "other real content" in got[3]


def test_remove_duplicate_spans_preserves_untouched_whitespace(spark):
    """Review fix: docs with NOTHING removed must come back
    byte-identical (newlines/tabs intact), not single-space-joined."""
    from pure_python_geospatial_export_spark.operators.curate import (
        remove_duplicate_spans,
    )
    from pure_python_geospatial_export_spark.session import local_df

    passage = "one two three four five six seven eight"
    keepme = "para one\n\npara two\twith tab  and   runs"
    rows = [
        (1, "a %s b" % passage),
        (2, "c %s d" % passage),
        (3, keepme),
    ]
    df = local_df(spark, rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in remove_duplicate_spans(
            df, ngram=8, min_docs=2
        ).collect()
    }
    assert got[3] == (keepme, 0)     # byte-identical, structure kept
    assert got[1] == ("a b", 8)
    assert got[2] == ("c d", 8)
