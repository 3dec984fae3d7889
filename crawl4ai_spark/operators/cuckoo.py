"""URL-seen set, cuckoo variant: the north star's "fallback cuckoo" next
to the partitioned bloom (operators/dedup.py).

Why a second filter: a bloom shard cannot *unlearn* a URL — recrawl
invalidation (cache STALE verdicts, sitemap lastmod bumps) would force a
full shard rebuild.  A cuckoo filter stores 16-bit fingerprints in
buckets, so deletion is an O(1) slot clear, and deleting an item that was
actually inserted NEVER introduces a false negative for the rest: two
different URLs sharing (fingerprint, bucket pair) each inserted their own
copy, and delete removes exactly one copy (standard partial-key cuckoo
multiset semantics — only ever delete items known to be inserted,
Fan et al., "Cuckoo Filter: Practically Better Than Bloom", CoNEXT'14).

Same scale shape as the bloom: the hash space splits into
``n_partitions`` shards; builds/tests are shard-local ``applyInPandas``
(no broadcast of a 10^10-key table), keys are JVM-side xxhash64 /
murmur3 so no URL string ever crosses into Python.  Membership tests are
fully numpy-vectorized.  Inserts walk items in deterministic order with
bounded eviction kicks (overflow lands in a per-shard stash checked by
the membership test, preserving the no-false-negative guarantee at any
load factor); shards build in parallel across executors.  The bloom
remains the primary write-once path — the cuckoo is selected when the
pipeline needs deletions, exactly the split the north star names.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CUCKOO_FORMAT_VERSION = 1
_BUCKET_SIZE = 4
_MAX_KICKS = 500
_FP_MIX = np.uint64(0x5BD1E995)  # fingerprint → partner-bucket mix

CUCKOO_SCHEMA = T.StructType(
    [
        T.StructField("cuckoo_part", T.IntegerType()),
        T.StructField("table", T.BinaryType()),   # (n_buckets × 4) uint16 slots
        T.StructField("stash", T.BinaryType()),   # overflow fingerprints, uint16
        T.StructField("n_items", T.LongType()),
        T.StructField("fmt_version", T.IntegerType()),
        T.StructField("n_partitions", T.IntegerType()),
        T.StructField("n_buckets", T.LongType()),
    ]
)


def cuckoo_version_ok(
    shards: DataFrame | None,
    n_partitions: int | None = None,
    n_buckets: int | None = None,
) -> bool:
    """True iff every persisted shard was built by the CURRENT format AND
    (when expected values are given) the CURRENT geometry — the mirror of
    ``dedup.bloom_version_ok``.  A differing ``n_partitions`` routes
    candidates to the WRONG shard (pmod with a different modulus), which
    produces false "definitely new" rows that skip the exact anti-join;
    a differing ``n_buckets`` probes the wrong bucket pair.  Callers must
    rebuild from the seen table on any mismatch."""
    if shards is None:
        return True
    cols = shards.columns
    if "fmt_version" not in cols:
        return False
    if (n_partitions is not None or n_buckets is not None) and (
        "n_partitions" not in cols or "n_buckets" not in cols
    ):
        return False  # pre-geometry-stamp shards: geometry unverifiable
    # NULL-safe min/max pair: a MIXED shard set (current deltas + stamp-less
    # files read as NULL) must fail — NULLs coalesce to -1 so min() sees them
    checks = [(F.col("fmt_version"), CUCKOO_FORMAT_VERSION)]
    if n_partitions is not None:
        checks.append((F.col("n_partitions"), int(n_partitions)))
    if n_buckets is not None:
        checks.append((F.col("n_buckets").cast("long"), int(n_buckets)))
    aggs = [F.count("*").alias("n")]
    for i, (c, _) in enumerate(checks):
        v = F.coalesce(c, F.lit(-1))
        aggs += [F.min(v).alias(f"lo{i}"), F.max(v).alias(f"hi{i}")]
    row = shards.agg(*aggs).first()
    if int(row["n"]) == 0:
        return True  # empty shard table
    return all(
        int(row[f"lo{i}"]) == int(row[f"hi{i}"]) == exp
        for i, (_, exp) in enumerate(checks)
    )


def _check_shard_geometry(sdf: pd.DataFrame, n_partitions: int, fn: str) -> None:
    """Defense-in-depth inside the cogroup kernels: the stamped geometry
    must match the caller's ``n_partitions`` (which already routed the
    candidates via pmod).  A mismatch means candidates were routed with a
    different modulus than the shards were built with — silent false
    negatives — so fail loudly and tell the caller to rebuild."""
    # pre-stamp persisted shards (columns absent in old parquet) must get
    # the same actionable message, not a raw KeyError (ADVICE r4)
    if "fmt_version" not in sdf.columns or "n_partitions" not in sdf.columns:
        raise ValueError(
            f"{fn}: shards predate the geometry stamp (no fmt_version/"
            "n_partitions columns); rebuild the cuckoo from the seen table"
        )
    fmt = sdf["fmt_version"]
    nparts = sdf["n_partitions"]
    if fmt.isna().any() or (fmt != CUCKOO_FORMAT_VERSION).any():
        raise ValueError(
            f"{fn}: shard fmt_version mismatch (expected {CUCKOO_FORMAT_VERSION}); "
            "rebuild the cuckoo from the seen table"
        )
    if nparts.isna().any() or (nparts != n_partitions).any():
        raise ValueError(
            f"{fn}: shards stamped n_partitions={sorted(set(nparts.dropna().astype(int)))} "
            f"but candidates were routed with n_partitions={n_partitions}; "
            "rebuild the cuckoo with the current geometry"
        )


def _with_cuckoo_keys(df: DataFrame, url_col: str, n_partitions: int) -> DataFrame:
    """Shard id (murmur3 of the canonical URL, like the bloom) + one
    xxhash64 key that yields both the fingerprint and the home bucket."""
    url = F.col(url_col)
    return df.withColumn(
        "cuckoo_part", F.pmod(F.hash(url), F.lit(n_partitions))
    ).withColumn("_ck", F.xxhash64(F.lit("cuckoo"), url))


def _fp_and_buckets(keys: np.ndarray, n_buckets: int):
    """fingerprint (1..65535, never the 0 empty sentinel) and both
    candidate buckets; XOR-partner so alternation is an involution."""
    k = keys.view(np.uint64)
    fp = ((k & np.uint64(0xFFFF)) % np.uint64(65535) + np.uint64(1)).astype(np.uint16)
    mask = np.uint64(n_buckets - 1)
    i1 = ((k >> np.uint64(16)) & mask).astype(np.int64)
    alt = ((fp.astype(np.uint64) * _FP_MIX) & mask).astype(np.int64)
    i2 = i1 ^ alt
    return fp, i1, i2


def _insert_all(table: np.ndarray, stash: list, fp: np.ndarray, i1: np.ndarray, i2: np.ndarray) -> None:
    """Deterministic insert loop: first free slot in i1 then i2, else
    bounded eviction (victim slot = kick counter mod bucket width —
    no RNG, so shard bytes are reproducible)."""
    n_buckets = table.shape[0]
    mask = np.int64(n_buckets - 1)
    for j in range(len(fp)):
        f = fp[j]
        for b in (i1[j], i2[j]):
            row = table[b]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = f
                break
        else:
            b = int(i2[j])
            cur = np.uint16(f)
            placed = False
            for kick in range(_MAX_KICKS):
                slot = kick % _BUCKET_SIZE
                cur, table[b, slot] = table[b, slot], cur
                alt = (np.uint64(cur) * _FP_MIX) & np.uint64(mask)
                b = int(np.int64(b) ^ np.int64(alt))
                row = table[b]
                empty = np.nonzero(row == 0)[0]
                if len(empty):
                    row[empty[0]] = cur
                    placed = True
                    break
            if not placed:
                stash.append(int(cur))


def build_cuckoo(
    df: DataFrame,
    url_col: str = "url",
    n_partitions: int = 32,
    n_buckets: int = 1 << 14,
    complete: bool = False,
) -> DataFrame:
    """Per-shard cuckoo tables for the URLs in ``df`` (one wave).

    ``complete`` also emits an EMPTY shard for every partition no URL
    hashed into, so a catalog-persisted filter can take
    ``cuckoo_insert`` wave deltas on any partition later."""
    assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be a power of two"

    def build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        table = np.zeros((n_buckets, _BUCKET_SIZE), np.uint16)
        stash: list = []
        keys = pdf["_ck"].to_numpy(np.int64)
        # deterministic insertion order regardless of upstream partitioning
        keys = np.sort(keys.view(np.uint64)).view(np.int64)
        fp, i1, i2 = _fp_and_buckets(keys, n_buckets)
        _insert_all(table, stash, fp, i1, i2)
        return pd.DataFrame(
            {
                "cuckoo_part": [key[0]],
                "table": [table.tobytes()],
                "stash": [np.asarray(stash, np.uint16).tobytes()],
                "n_items": [len(pdf)],
                "fmt_version": [CUCKOO_FORMAT_VERSION],
                "n_partitions": [n_partitions],
                "n_buckets": [n_buckets],
            }
        )

    with_part = _with_cuckoo_keys(df, url_col, n_partitions)
    built = with_part.groupBy("cuckoo_part").applyInPandas(build, CUCKOO_SCHEMA)
    if not complete:
        return built

    def empty(key, pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "cuckoo_part": [key[0]],
                "table": [np.zeros((n_buckets, _BUCKET_SIZE), np.uint16).tobytes()],
                "stash": [b""],
                "n_items": [0],
                "fmt_version": [CUCKOO_FORMAT_VERSION],
                "n_partitions": [n_partitions],
                "n_buckets": [n_buckets],
            }
        )

    spark = df.sparkSession
    # which partitions exist: re-derive from the (cheap) shard-routing
    # hash, NOT from `built` — anti-joining built would evaluate the
    # whole applyInPandas build kernel a second time
    occupied = _with_cuckoo_keys(df, url_col, n_partitions).select("cuckoo_part").distinct()
    missing = (
        spark.range(n_partitions)
        .select(F.col("id").cast("int").alias("cuckoo_part"))
        .join(occupied, "cuckoo_part", "left_anti")
    )
    return built.unionByName(missing.groupBy("cuckoo_part").applyInPandas(empty, CUCKOO_SCHEMA))


def cuckoo_insert(
    shards: DataFrame, urls: DataFrame, url_col: str = "url", n_partitions: int = 32
) -> DataFrame:
    """Insert a new wave's URLs into an EXISTING consolidated shard set —
    the wave-incremental write path for a catalog-persisted cuckoo
    (bloom deltas OR-merge; cuckoo tables instead take in-place inserts,
    so the persisted filter is always one consolidated set per partition
    and stays deletable).  Partitions with no shard row yet are built
    fresh; multi-delta inputs raise like ``cuckoo_delete``."""
    keyed = _with_cuckoo_keys(urls, url_col, n_partitions)

    def put(key, sdf: pd.DataFrame, udf: pd.DataFrame) -> pd.DataFrame:
        if len(sdf) > 1:
            raise ValueError(
                "cuckoo_insert: multiple shard deltas per partition; rebuild one "
                "consolidated cuckoo before inserting (cuckoo shards are not mergeable)"
            )
        if len(sdf) == 0:
            if len(udf) == 0:
                return pd.DataFrame(columns=[f.name for f in CUCKOO_SCHEMA.fields])
            raise ValueError(
                "cuckoo_insert: no shard for partition "
                f"{int(udf['cuckoo_part'].iloc[0])}; build_cuckoo the first wave "
                "so every partition has a (possibly empty) shard row"
            )
        _check_shard_geometry(sdf, n_partitions, "cuckoo_insert")
        if len(udf) == 0:
            return sdf
        n_buckets = int(sdf["n_buckets"].iloc[0])
        table = np.frombuffer(sdf["table"].iloc[0], np.uint16).reshape(n_buckets, _BUCKET_SIZE).copy()
        stash = list(np.frombuffer(sdf["stash"].iloc[0], np.uint16))
        keys = np.sort(udf["_ck"].to_numpy(np.int64).view(np.uint64)).view(np.int64)
        fp, i1, i2 = _fp_and_buckets(keys, n_buckets)
        _insert_all(table, stash, fp, i1, i2)
        out = sdf.iloc[[0]].copy()
        out["table"] = [table.tobytes()]
        out["stash"] = [np.asarray(stash, np.uint16).tobytes()]
        out["n_items"] = [int(sdf["n_items"].iloc[0]) + len(udf)]
        return out

    return (
        shards.groupBy("cuckoo_part")
        .cogroup(keyed.groupBy("cuckoo_part"))
        .applyInPandas(put, CUCKOO_SCHEMA)
    )


def cuckoo_delete(
    shards: DataFrame, urls: DataFrame, url_col: str = "url", n_partitions: int = 32
) -> DataFrame:
    """Remove one fingerprint copy per URL (recrawl invalidation).  Only
    ever pass URLs that were inserted — the cuckoo deletion contract."""
    keyed = _with_cuckoo_keys(urls, url_col, n_partitions)

    def drop(key, sdf: pd.DataFrame, udf: pd.DataFrame) -> pd.DataFrame:
        if len(sdf) == 0:
            if len(udf):
                # a delete targeting a partition with no shard row means the
                # URL was never inserted here (or geometry drifted) — the
                # deletion contract only covers inserted items, so fail
                # loudly instead of silently keeping stale entries
                raise ValueError(
                    "cuckoo_delete: no shard for partition "
                    f"{int(udf['cuckoo_part'].iloc[0])} but {len(udf)} delete(s) "
                    "target it; only ever delete URLs that were inserted "
                    "(rebuild the cuckoo if geometry changed)"
                )
            return sdf
        if len(sdf) > 1:
            # deleting from unmerged wave deltas would need to know WHICH
            # delta inserted each URL — fail loudly instead of silently
            # dropping deltas.  Cuckoo tables are NOT bitwise-mergeable
            # (unlike the bloom's OR-merge), so the remediation is a
            # rebuild: re-run build_cuckoo over the union of source URLs
            # to get one consolidated shard set per partition.
            raise ValueError(
                "cuckoo_delete: multiple shard deltas per partition; rebuild one "
                "consolidated cuckoo from the source URLs before deleting "
                "(cuckoo shards are not mergeable)"
            )
        _check_shard_geometry(sdf, n_partitions, "cuckoo_delete")
        if len(udf) == 0:
            return sdf
        n_buckets = int(sdf["n_buckets"].iloc[0])
        table = np.frombuffer(sdf["table"].iloc[0], np.uint16).reshape(n_buckets, _BUCKET_SIZE).copy()
        stash = list(np.frombuffer(sdf["stash"].iloc[0], np.uint16))
        # np.unique (sorted + deduped): a delete batch naming the same URL
        # twice — plausible in a recrawl-invalidation list — was inserted
        # once, so it must remove one fingerprint, not fail the job
        # demanding two (ADVICE r4)
        keys = np.unique(udf["_ck"].to_numpy(np.int64).view(np.uint64)).view(np.int64)
        fp, i1, i2 = _fp_and_buckets(keys, n_buckets)
        removed = 0
        for j in range(len(fp)):
            f = fp[j]
            done = False
            for b in (i1[j], i2[j]):
                hits = np.nonzero(table[b] == f)[0]
                if len(hits):
                    table[b, hits[0]] = 0
                    done = True
                    break
            if not done and f in stash:
                stash.remove(int(f))
                done = True
            removed += int(done)
        if removed != len(fp):
            # a delete of a never-inserted URL (or one already deleted)
            # violates the cuckoo deletion contract the module's safety
            # argument depends on — surface it instead of no-op'ing
            raise ValueError(
                f"cuckoo_delete: partition {int(sdf['cuckoo_part'].iloc[0])} "
                f"removed {removed} of {len(fp)} requested fingerprints; "
                "deletes must target URLs that were actually inserted"
            )
        out = sdf.iloc[[0]].copy()
        out["table"] = [table.tobytes()]
        out["stash"] = [np.asarray(stash, np.uint16).tobytes()]
        out["n_items"] = [int(sdf["n_items"].iloc[0]) - removed]
        return out

    return (
        shards.groupBy("cuckoo_part")
        .cogroup(keyed.groupBy("cuckoo_part"))
        .applyInPandas(drop, CUCKOO_SCHEMA)
    )


def cuckoo_maybe_seen(
    candidates: DataFrame, shards: DataFrame, url_col: str = "url", n_partitions: int = 32
) -> DataFrame:
    """Tag candidates with ``maybe_seen`` — fully vectorized shard-local
    test (both buckets + stash).  No false negatives for inserted,
    undeleted items, by cuckoo construction."""
    cand = _with_cuckoo_keys(candidates, url_col, n_partitions)
    out_schema = T.StructType(
        cand.schema.fields + [T.StructField("maybe_seen", T.BooleanType())]
    )

    def test(key, cdf: pd.DataFrame, sdf: pd.DataFrame) -> pd.DataFrame:
        if len(cdf) == 0:
            return cdf.assign(maybe_seen=pd.Series([], dtype=bool))
        if len(sdf) == 0:
            return cdf.assign(maybe_seen=False)
        _check_shard_geometry(sdf, n_partitions, "cuckoo_maybe_seen")
        hit = np.zeros(len(cdf), bool)
        keys = cdf["_ck"].to_numpy(np.int64)
        for _, srow in sdf.iterrows():  # unmerged wave deltas: OR of tests
            n_buckets = int(srow["n_buckets"])
            table = np.frombuffer(srow["table"], np.uint16).reshape(n_buckets, _BUCKET_SIZE)
            stash = np.frombuffer(srow["stash"], np.uint16)
            fp, i1, i2 = _fp_and_buckets(keys, n_buckets)
            h = (table[i1] == fp[:, None]).any(axis=1)
            h |= (table[i2] == fp[:, None]).any(axis=1)
            if len(stash):
                h |= np.isin(fp, stash)
            hit |= h
        return cdf.assign(maybe_seen=hit)

    return (
        cand.groupBy("cuckoo_part")
        .cogroup(shards.groupBy("cuckoo_part"))
        .applyInPandas(test, out_schema)
        .drop("cuckoo_part", "_ck")
    )


def cuckoo_anti_join_seen(
    candidates: DataFrame,
    seen: DataFrame | None,
    shards: DataFrame | None,
    url_col: str = "url",
    seen_col: str = "url",
    n_partitions: int = 32,
) -> DataFrame:
    """Exact new-URL set with the cuckoo as pre-filter: definitely-new
    rows skip the anti-join, maybe-seen rows (true dupes + ~0.01% false
    positives at 16-bit fingerprints) pay the exact verify — identical
    contract to dedup.anti_join_seen."""
    if seen is None:
        return candidates
    seen_keys = seen.select(F.col(seen_col).alias(url_col)).distinct()
    if shards is None:
        return candidates.join(seen_keys, url_col, "left_anti")
    tagged = cuckoo_maybe_seen(candidates, shards, url_col, n_partitions)
    fresh = tagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = tagged.filter(F.col("maybe_seen")).drop("maybe_seen")
    return fresh.unionByName(maybe.join(seen_keys, url_col, "left_anti"))
