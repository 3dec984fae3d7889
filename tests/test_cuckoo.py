"""Cuckoo-filter seen-set tests (operators/cuckoo.py — the north star's
"fallback cuckoo" beside the bloom shards).

Contracts pinned: no false negatives for inserted items (before AND after
deleting other items), deterministic shard bytes under any upstream
partitioning, stash overflow keeps the guarantee at pathological load,
and the pre-filtered anti-join equals the plain exact anti-join.
"""

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators.cuckoo import (
    CUCKOO_FORMAT_VERSION,
    build_cuckoo,
    cuckoo_anti_join_seen,
    cuckoo_delete,
    cuckoo_maybe_seen,
    cuckoo_version_ok,
)


def _urls(spark, ids, prefix="https://s.test/p"):
    return spark.createDataFrame([(f"{prefix}{i}",) for i in ids], ["url"])


@pytest.fixture(scope="module")
def seen(spark):
    df = _urls(spark, range(2000))
    df.persist().count()
    return df


@pytest.fixture(scope="module")
def shards(spark, seen):
    df = build_cuckoo(seen, n_partitions=8, n_buckets=1 << 10)
    df.persist().count()
    return df


def test_no_false_negatives(spark, seen, shards):
    tagged = cuckoo_maybe_seen(seen, shards, n_partitions=8)
    assert tagged.filter(~F.col("maybe_seen")).count() == 0


def test_false_positive_rate_small(spark, shards):
    fresh = _urls(spark, range(2000), prefix="https://other.test/x")
    tagged = cuckoo_maybe_seen(fresh, shards, n_partitions=8)
    fp = tagged.filter(F.col("maybe_seen")).count()
    assert fp / 2000 < 0.01  # 16-bit fingerprints: ~0.01% expected


def test_anti_join_equals_exact(spark, seen, shards):
    cands = _urls(spark, range(1500, 3500))
    via_cuckoo = {
        r["url"]
        for r in cuckoo_anti_join_seen(cands, seen, shards, n_partitions=8).collect()
    }
    exact = {r["url"] for r in cands.join(seen, "url", "left_anti").collect()}
    assert via_cuckoo == exact


def test_deletion_enables_recrawl_without_false_negatives(spark, seen, shards):
    to_delete = _urls(spark, range(0, 2000, 10))  # 200 inserted urls
    pruned = cuckoo_delete(shards, to_delete, n_partitions=8)
    pruned.persist().count()
    # remaining items: still zero false negatives (multiset delete removes
    # exactly one copy per deleted item)
    remaining = _urls(spark, [i for i in range(2000) if i % 10 != 0])
    tagged = cuckoo_maybe_seen(remaining, pruned, n_partitions=8)
    assert tagged.filter(~F.col("maybe_seen")).count() == 0
    # deleted items: overwhelmingly not-seen (collisions with other live
    # fingerprints may keep a few flagged — that's the documented fp rate)
    dtag = cuckoo_maybe_seen(to_delete, pruned, n_partitions=8)
    still = dtag.filter(F.col("maybe_seen")).count()
    assert still / 200 < 0.05


def test_shard_bytes_deterministic_across_partitioning(spark, seen):
    a = {r["cuckoo_part"]: (bytes(r["table"]), bytes(r["stash"]))
         for r in build_cuckoo(seen.repartition(1), n_partitions=4, n_buckets=1 << 10).collect()}
    b = {r["cuckoo_part"]: (bytes(r["table"]), bytes(r["stash"]))
         for r in build_cuckoo(seen.repartition(17), n_partitions=4, n_buckets=1 << 10).collect()}
    assert a == b  # sorted-key insertion → byte-identical shards


def test_stash_overflow_keeps_guarantee(spark):
    # 3000 items into 8 shards of 64 buckets × 4 slots ≈ 146% load — the
    # eviction loop must overflow into the stash, not lose items
    many = _urls(spark, range(3000))
    shards = build_cuckoo(many, n_partitions=8, n_buckets=64)
    stash_bytes = shards.agg(F.sum(F.length("stash"))).first()[0]
    assert stash_bytes > 0  # overflow actually exercised
    tagged = cuckoo_maybe_seen(many, shards, n_partitions=8)
    assert tagged.filter(~F.col("maybe_seen")).count() == 0


def test_version_ok_accepts_current_and_rejects_drift(spark, shards):
    assert cuckoo_version_ok(None)
    assert cuckoo_version_ok(shards, n_partitions=8, n_buckets=1 << 10)
    # wrong caller geometry → must fail (wrong-shard routing hazard)
    assert not cuckoo_version_ok(shards, n_partitions=16, n_buckets=1 << 10)
    assert not cuckoo_version_ok(shards, n_partitions=8, n_buckets=1 << 12)
    # stale format version → must fail
    stale = shards.withColumn("fmt_version", F.lit(CUCKOO_FORMAT_VERSION - 1))
    assert not cuckoo_version_ok(stale, n_partitions=8, n_buckets=1 << 10)
    # MIXED set (one NULL-stamped row among current ones) → must fail
    nulled = shards.withColumn(
        "n_partitions",
        F.when(F.col("cuckoo_part") == 0, F.lit(None)).otherwise(F.col("n_partitions")),
    )
    assert not cuckoo_version_ok(nulled, n_partitions=8, n_buckets=1 << 10)


def test_readers_reject_mismatched_geometry(spark, seen, shards):
    # shards built with 8 partitions, candidates routed with 4: the cogroup
    # kernel must raise instead of silently producing false 'definitely new'
    with pytest.raises(Exception, match="n_partitions"):
        cuckoo_maybe_seen(seen.limit(50), shards, n_partitions=4).collect()
    with pytest.raises(Exception, match="n_partitions"):
        cuckoo_delete(shards, _urls(spark, [1]), n_partitions=4).collect()


def test_delete_of_never_inserted_url_raises(spark, shards):
    ghost = _urls(spark, [99], prefix="https://never.test/x")
    with pytest.raises(Exception, match="actually inserted|never inserted|no shard"):
        cuckoo_delete(shards, ghost, n_partitions=8).collect()


def test_delete_rejects_unmerged_deltas(spark):
    wave1 = build_cuckoo(_urls(spark, range(100)), n_partitions=4, n_buckets=1 << 10)
    wave2 = build_cuckoo(_urls(spark, range(100, 200)), n_partitions=4, n_buckets=1 << 10)
    deltas = wave1.unionByName(wave2)
    with pytest.raises(Exception, match="rebuild one consolidated cuckoo"):
        cuckoo_delete(deltas, _urls(spark, [5]), n_partitions=4).collect()


def test_insert_into_persisted_shards(spark, seen):
    from crawl4ai_spark.operators.cuckoo import cuckoo_insert

    shards = build_cuckoo(seen, n_partitions=8, n_buckets=1 << 10, complete=True)
    shards.persist().count()
    newer = _urls(spark, range(2000, 2600))
    grown = cuckoo_insert(shards, newer, n_partitions=8)
    grown.persist().count()
    both = seen.unionByName(newer)
    tagged = cuckoo_maybe_seen(both, grown, n_partitions=8)
    assert tagged.filter(~F.col("maybe_seen")).count() == 0
    assert grown.agg(F.sum("n_items")).first()[0] == 2600


def test_catalog_persisted_cuckoo_resume_with_deletion(spark, tmp_path):
    """The seen-set story's catalog symmetry (VERDICT r3 item 8): the
    cuckoo persists as snapshot STATE (consolidated, not delta-merged —
    cuckoo tables are not mergeable), survives a catalog reopen, takes a
    wave-incremental insert plus a recrawl-invalidation delete across
    the snapshot boundary, and the pre-filtered anti-join still equals
    the exact anti-join against (seen - deleted)."""
    from crawl4ai_spark.operators.cuckoo import cuckoo_insert
    from crawl4ai_spark.sources.catalog import SnapshotCatalog

    root = str(tmp_path / "cat")
    seen1 = _urls(spark, range(300))

    cat = SnapshotCatalog(root, spark)
    shards1 = build_cuckoo(seen1, n_partitions=8, n_buckets=1 << 10, complete=True)
    cat.commit_wave(1, state={"cuckoo": shards1}, appends={"seen": seen1})

    # resume: fresh catalog object, same root
    cat2 = SnapshotCatalog(root, spark)
    shards = cat2.read("cuckoo")
    assert cuckoo_version_ok(shards, n_partitions=8, n_buckets=1 << 10)
    seen2 = _urls(spark, range(300, 400))
    recrawl = _urls(spark, range(0, 300, 30))  # 10 urls invalidated
    grown = cuckoo_insert(shards, seen2, n_partitions=8)
    pruned = cuckoo_delete(grown, recrawl, n_partitions=8)
    cat2.commit_wave(
        2, state={"cuckoo": pruned},
        appends={"seen": seen2.join(recrawl, "url", "left_anti")},
    )

    # reopen once more and drive candidates through the persisted filter
    cat3 = SnapshotCatalog(root, spark)
    shards3 = cat3.read("cuckoo")
    assert cuckoo_version_ok(shards3, n_partitions=8, n_buckets=1 << 10)
    live = seen1.unionByName(seen2).join(recrawl, "url", "left_anti")
    cands = _urls(spark, range(0, 500))
    got = {r["url"] for r in cuckoo_anti_join_seen(cands, live, shards3, n_partitions=8).collect()}
    exact = {r["url"] for r in cands.join(live, "url", "left_anti").collect()}
    assert got == exact
    # the recrawled urls are back in the frontier
    assert {f"https://s.test/p{i}" for i in range(0, 300, 30)} <= got


def test_delete_batch_with_duplicate_urls_succeeds(spark, seen, shards):
    """ADVICE r4: a delete batch naming the same URL twice (plausible in a
    recrawl-invalidation list) was inserted once — the kernel dedupes the
    fingerprint keys instead of failing the job demanding two copies."""
    dup = _urls(spark, [7, 7, 13, 13, 13, 21])
    pruned = cuckoo_delete(shards, dup, n_partitions=8)
    pruned.persist().count()
    remaining = _urls(spark, [i for i in range(2000) if i not in (7, 13, 21)])
    tagged = cuckoo_maybe_seen(remaining, pruned, n_partitions=8)
    assert tagged.filter(~F.col("maybe_seen")).count() == 0


def test_legacy_shards_without_geometry_stamp_fail_actionably():
    """ADVICE r4: pre-stamp persisted shards (no fmt_version/n_partitions
    columns) must die with the actionable rebuild message, not a raw
    KeyError inside the cogroup kernel."""
    import pandas as pd
    import pytest as _pytest

    from crawl4ai_spark.operators.cuckoo import _check_shard_geometry

    legacy = pd.DataFrame({"cuckoo_part": [0], "n_buckets": [1024],
                           "table": [b""], "stash": [b""], "n_items": [0]})
    with _pytest.raises(ValueError, match="rebuild the cuckoo"):
        _check_shard_geometry(legacy, 8, "cuckoo_delete")
