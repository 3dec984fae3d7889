"""Training-data ops: dedup families, similarity search, text analysis."""

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.functions import text as tx
from crawl4ai_spark.operators import docdedup, similarity


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (1, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 0
        (2, "the quick brown fox jumps over the lazy dog near the river bank tomorrow"),  # near dup
        (3, "completely different text about spark partitions and shuffle behavior here"),
        (4, "another unrelated document describing bloom filters and politeness budgets"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    survivors = {r["doc_id"] for r in docdedup.exact_dedup(docs).collect()}
    assert survivors == {0, 2, 3, 4}
    groups = docdedup.exact_dup_groups(docs).collect()
    assert len(groups) == 1 and groups[0]["n_dups"] == 2 and groups[0]["canonical_id"] == 0


def test_ngram_jaccard(spark, docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in docdedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and 0.5 <= pairs[(0, 2)] < 1.0
    assert not any(3 in p or 4 in p for p in pairs)


def test_minhash_lsh_vs_exact_jaccard(spark, docs):
    lsh = {(r["id_a"], r["id_b"]) for r in docdedup.minhash_lsh_pairs(docs, threshold=0.5, n_perm=16, bands=8).collect()}
    exact = {(r["id_a"], r["id_b"]) for r in docdedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    # verification step removes false positives; recall here should be total
    # for the exact-dup pair, and the near-dup pair collides with 8 bands
    assert lsh <= exact
    assert (0, 1) in lsh


def test_simhash(spark, docs):
    # band_bits=4 → 16 bands: any pair within hamming 15 shares a clean band
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in docdedup.simhash_pairs(docs, max_hamming=10, band_bits=4).collect()
    }
    assert pairs.get((0, 1)) == 0  # identical text → identical simhash
    assert (0, 2) in pairs  # one-word difference → few bit flips
    assert not any((p[0] in (3, 4)) or (p[1] in (3, 4)) for p in pairs if p != (3, 4))


@pytest.fixture(scope="module")
def vectors(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_brute_force_topk(spark, vectors):
    queries = vectors.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = similarity.brute_force_topk(vectors, queries, k=5)
    rows = out.collect()
    assert len(rows) == 15
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        # self is its own nearest neighbor
        assert rs[0]["neighbor_id"] == qid and rs[0]["cosine"] == pytest.approx(1.0, abs=1e-6)
        assert all(rs[i]["cosine"] >= rs[i + 1]["cosine"] - 1e-9 for i in range(len(rs) - 1))


def test_lsh_topk_recall(spark, vectors):
    queries = vectors.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.brute_force_topk(vectors, queries, k=10)
    approx = similarity.lsh_topk(vectors, queries, k=10, n_planes=6, n_tables=4)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5  # multiprobe hyperplane LSH on clustered data


def test_embedding_near_dup(spark, vectors):
    # duplicate a vector under a new id → must be found as a near-dup
    dup = vectors.filter(F.col("vec_id") == 7).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
    )
    pairs = similarity.embedding_near_dup_pairs(vectors.unionByName(dup), threshold=0.999)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (7, 100007) in got


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


def test_text_ops(spark):
    df = spark.createDataFrame(
        [
            (1, "The quick brown fox and the lazy dog walk to the river in the morning."),
            (2, "el la de que los " * 3),
            (3, "!!! ??? ### $$$"),
        ],
        "doc_id long, text string",
    )
    out = df.select(
        "doc_id",
        tx.token_count_expr(F.col("text")).alias("n_tokens"),
        tx.bpe_token_count_expr(F.col("text")).alias("n_bpe"),
        tx.quality_score_expr(F.col("text")).alias("quality"),
        tx.lang_id_expr(F.col("text")).alias("lang"),
        tx.fingerprint_expr(F.col("text")).alias("fp"),
    ).collect()
    rows = {r["doc_id"]: r for r in out}
    assert rows[1]["n_tokens"] == 15
    assert rows[1]["lang"] == "en"
    assert rows[2]["lang"] == "es"
    assert rows[3]["lang"] == "unknown"
    assert rows[1]["quality"] > rows[3]["quality"]
    assert rows[1]["n_bpe"] > rows[1]["n_tokens"]  # punctuation split off
    assert len(rows[1]["fp"]) == 32  # md5 hex


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",)], "text string")
    got = df.select(tx.shingles_expr(F.col("text"), 3).alias("s")).collect()[0]["s"]
    assert got == ["a b c", "b c d"]


def test_simhash_md5_portable_twin(spark):
    """The md5-60-bit SimHash twin: exact dups collide at hamming 0;
    near-dups (one token appended) stay within the threshold; empty docs
    never band."""
    from crawl4ai_spark.operators import docdedup

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [(1, base), (2, base), (3, base + " extraword"), (4, ""), (5, "")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in docdedup.simhash_pairs_md5(docs, max_hamming=10, band_bits=5).collect()}
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and pairs[(1, 3)] <= 10
    assert not any(4 in p or 5 in p for p in pairs)
    # table values are 60-bit non-negative longs
    sh = {r["doc_id"]: r["simhash"] for r in docdedup.simhash_table_md5(docs).collect()}
    assert all(0 <= v < (1 << 60) for v in sh.values())
    assert sh[1] == sh[2]


def test_ngram_posting_cap_equal_when_uncapped(spark):
    """max_posting above the largest posting list changes nothing; a
    tight cap still finds pairs sharing any non-stop shingle, with EXACT
    jaccard values."""
    from crawl4ai_spark.operators import docdedup

    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),          # exact dup of 1
        (3, "alpha beta gamma delta epsilon eta"),           # near dup
        (4, "totally different words in this one here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    base = {(r["id_a"], r["id_b"]): r["jaccard"]
            for r in docdedup.ngram_jaccard_pairs(docs, threshold=0.3, n=2).collect()}
    hi = {(r["id_a"], r["id_b"]): r["jaccard"]
          for r in docdedup.ngram_jaccard_pairs(docs, threshold=0.3, n=2, max_posting=100).collect()}
    assert base == hi
    # cap=2 drops shingles shared by all of 1,2,3; pairs still surface via
    # their rarer shingles and keep exact jaccard
    lo = {(r["id_a"], r["id_b"]): r["jaccard"]
          for r in docdedup.ngram_jaccard_pairs(docs, threshold=0.3, n=2, max_posting=2).collect()}
    for k, v in lo.items():
        assert base[k] == pytest.approx(v)
    assert (1, 2) in lo


def test_banding_guarantee_enforced(spark):
    """A geometry that cannot guarantee recall at max_hamming raises
    instead of silently missing pairs; a compliant geometry FINDS a pair
    whose flips are spread across what the old 4x16 banding missed."""
    from crawl4ai_spark.operators.docdedup import banded_hamming_pairs

    # hashes differing in exactly 4 bits, one per 16-bit quarter — the
    # old 4-band default had NO shared band for this pair
    a = 0
    b = (1 << 0) | (1 << 16) | (1 << 32) | (1 << 48)
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, simhash long")
    got = banded_hamming_pairs(df, max_hamming=6, band_bits=8).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in got] == [(1, 2, 4)]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        banded_hamming_pairs(df, max_hamming=6, band_bits=16)  # 4 bands ≤ 6


def test_minhash_lsh_empty_docs_not_banded(spark):
    """Zero-shingle docs must not enter the band join (their degenerate
    band keys would collide pairwise) and never appear in output."""
    rows = [(i, "") for i in range(300)] + [(i, "ab") for i in range(300, 600)]
    rows += [(9001, "alpha beta gamma delta epsilon"), (9002, "alpha beta gamma delta epsilon")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = docdedup.minhash_lsh_pairs(docs, threshold=0.5, n_perm=16, bands=4, n=3)
    got = pairs.collect()
    assert {(r["id_a"], r["id_b"]) for r in got} == {(9001, 9002)}


def test_dedup_components_matches_union_find(spark):
    import random

    from crawl4ai_spark.operators.docdedup import dedup_components

    rng = random.Random(7)
    edges = sorted({tuple(sorted(rng.sample(range(60), 2))) for _ in range(80)})
    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges], "id_a long, id_b long"
    )
    got = {
        (r["doc_id"], r["canonical_id"])
        for r in dedup_components(pairs).collect()
    }
    # reference union-find
    parent = list(range(60))
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in edges:
        parent[find(a)] = find(b)
    comp = {}
    for n in {v for e in edges for v in e}:
        comp.setdefault(find(n), []).append(n)
    want = {(n, min(ms)) for ms in comp.values() for n in ms}
    assert got == want


def test_dedup_components_empty_and_chain(spark):
    from crawl4ai_spark.operators.docdedup import dedup_components

    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert dedup_components(empty).count() == 0
    # a 12-node chain needs O(length) label rounds — exercises convergence
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "id_a long, id_b long"
    )
    rows = dedup_components(chain).collect()
    assert len(rows) == 12 and all(r["canonical_id"] == 0 for r in rows)


def test_spread_skips_shuffled_frames(spark):
    from pyspark.sql import functions as F

    from crawl4ai_spark.operators.docdedup import _spread

    par = spark.sparkContext.defaultParallelism
    narrow = spark.createDataFrame([(i, "t") for i in range(10)], "doc_id long, text string").coalesce(1)
    assert _spread(narrow).rdd.getNumPartitions() >= min(par, 10) or par == 1
    # a post-shuffle frame must be returned untouched: probing .rdd there
    # would eagerly execute the upstream shuffle under AQE
    shuffled = narrow.groupBy("doc_id").agg(F.count("*").alias("n"))
    assert _spread(shuffled) is shuffled


def test_xxh64_duckdb_sql_matches_spark(spark):
    """The oracle-side XXH64 (pure DuckDB SQL, HUGEINT mod-2^64 with
    split multiplies — __spark_entry__._xxh64_sql_chain) must equal
    Spark's xxhash64 (seed 42 over UTF-8 bytes) bit-for-bit: fixed
    vectors covering the empty string, every tail combination (8/4/1
    byte steps), the >=32-byte four-accumulator path, multi-byte UTF-8,
    plus seeded random ASCII/unicode fuzz."""
    import random
    import sys

    import duckdb

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as em

    rng = random.Random(4242)
    toks = ["", "a", "ab", "abc", "abcd", "abcde", "abcdefg", "abcdefgh",
            "abcdefghi", "abcdefghijkl", "abcdefghijklm", "x" * 31, "y" * 32,
            "z" * 33, "w" * 39, "v" * 40, "u" * 100, "café", "naïve—dash",
            "日本語テキスト", "mixed café 42 日本"]
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789éü—日本 "
    toks += ["".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 70)))
             for _ in range(40)]

    sdf = spark.createDataFrame([(t,) for t in toks], "tok string")
    want = {r.tok: r.h for r in sdf.select("tok", F.xxhash64("tok").alias("h")).collect()}

    con = duckdb.connect()
    vals = ", ".join("('" + t.replace("'", "''") + "')" for t in toks)
    sql = em._xxh64_sql_chain(f"SELECT tok FROM (VALUES {vals}) v(tok)")
    got = {tok: h for tok, h in con.sql(f"SELECT tok, xxh64 FROM ({sql}) q").fetchall()}
    assert len(got) == len(toks) == len(want)
    for t in toks:
        assert got[t] == want[t], (repr(t), got[t], want[t])
