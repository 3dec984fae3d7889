"""Document deduplication for training-data pipelines.

Five dedup families over a documents table (doc_id, text):

* **exact** — md5 groupBy, keep the lowest doc_id per hash.
* **n-gram Jaccard** — inverted-index join on shingles (explode →
  self-join on shingle → pair-count), the MapReduce-style pairwise
  similarity that avoids an O(n²) cross join; Jaccard from
  |A∩B| / (|A|+|B|-|A∩B|).
* **MinHash + LSH** — md5-based portable minhash signatures
  (hashing.minhash_expr), banded into buckets; candidate pairs share a
  band; verified with exact Jaccard.
* **SimHash** — 64-bit bit-vote hash over xxhash64(token); near-dups by
  Hamming distance (JVM bit_count).
* **embedding cosine** — near-dup pairs above a cosine threshold (see
  similarity.py for the ANN machinery).

Everything except nothing is JVM-side: no Python UDFs anywhere in this
module.  Hash choices are deliberate: md5 hex strings where an external
SQL oracle must reproduce values, xxhash64 where only Spark-side
consistency matters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import minhash_expr
from ..functions.text import shingles_expr, tokens_expr


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Survivors of exact dedup: lowest id per md5(text)."""
    hashed = docs.withColumn("_h", F.md5(F.col(text_col)))
    w = Window.partitionBy("_h").orderBy(F.col(id_col).asc())
    return hashed.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_h", "_rn")


def exact_dup_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(hash, n_dups, canonical_id) for groups with >1 member."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("canonical_id"))
        .filter(F.col("n_dups") > 1)
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard via inverted index
# ---------------------------------------------------------------------------


def _spread(docs: DataFrame) -> DataFrame:
    """Round-robin narrow inputs out to the cluster's parallelism.

    Shingling + per-shingle hashing is the CPU plane of every dedup
    operator here; a small parquet scan (few row-groups → few input
    partitions) would otherwise pin that work to a handful of cores
    (measured: 3 partitions at sf0.1 left 29 of 32 cores idle, 6.7 s for
    shingling alone).  At 100-TB scale the scan already yields thousands
    of partitions and this is a no-op — the repartition only fires when
    the input is NARROWER than the cluster, so no shuffle is added on
    the big-data path."""
    import re

    par = docs.sparkSession.sparkContext.defaultParallelism
    # Only inspect .rdd when the plan is provably shuffle-free: under
    # AQE, .rdd on a plan WITH exchanges finalizes the adaptive plan and
    # eagerly runs every upstream shuffle stage just to read a partition
    # count (then the real action re-plans and re-runs them).  Exchanges
    # are invisible before EnsureRequirements (sparkPlan() never shows
    # them), so gate on the ANALYZED plan instead: probe only chains of
    # scan/project/filter/union nodes — exactly the narrow-input shapes
    # this helper exists for.  Anything else (joins, aggregates, windows,
    # limits, …) is returned untouched; a post-shuffle frame is already
    # spark.sql.shuffle.partitions wide anyway.
    _SAFE_NODES = {
        "Relation", "LogicalRDD", "LocalRelation", "Project", "Filter",
        "Union", "SubqueryAlias", "View",
    }
    plan = docs._jdf.queryExecution().analyzed().toString()
    for line in plan.splitlines():
        m = re.match(r"^[\s:+|-]*'?([A-Za-z]\w*)", line)
        if not m:
            continue
        node = m.group(1)
        # coalesce() prints as "Repartition n, false" — narrow, safe to
        # probe; a shuffling repartition(n) says "true" and is not
        if node == "Repartition" and ", false" in line:
            continue
        if node not in _SAFE_NODES:
            return docs
    if docs.rdd.getNumPartitions() < par:
        return docs.repartition(par)
    return docs


def _shingled(docs: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    return _spread(docs).select(
        F.col(id_col).alias("doc_id"), shingles_expr(F.col(text_col), n).alias("shingles")
    ).withColumn("n_shingles", F.size("shingles"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_posting: int = 0,
) -> DataFrame:
    """All pairs with shingle-Jaccard ≥ threshold.

    Shuffle profile: one explode + self-equi-join on the shingle value +
    one aggregation — each shingle's posting list joins locally; a
    stop-shingle appearing in f docs contributes f² pair rows.

    ``max_posting`` > 0 drops shingles whose posting list exceeds it
    (standard stop-shingle prefix filtering) — the 100-TB guard against
    boilerplate shingles going quadratic.  Candidate GENERATION then
    misses only pairs whose every shared shingle is a stop-shingle; the
    Jaccard itself stays exact because intersections are recomputed from
    the FULL shingle sets of surviving candidate pairs, so a capped run
    can only lose pairs gated by ultra-common boilerplate (at
    threshold ≥ 0.8 such pairs are boilerplate dups that exact/minhash
    dedup already catches).
    """
    sh = _shingled(docs, text_col, id_col, n)
    posts = sh.select("doc_id", "n_shingles", F.explode("shingles").alias("shingle"))
    if max_posting and max_posting > 0:
        df_counts = posts.groupBy("shingle").agg(F.count("*").alias("_pf"))
        posts = posts.join(
            df_counts.filter(F.col("_pf") <= max_posting).select("shingle"), "shingle"
        )
        # exact verify on full shingle sets for the surviving candidates
        cand = (
            posts.select(F.col("shingle"), F.col("doc_id").alias("id_a"))
            .join(posts.select(F.col("shingle"), F.col("doc_id").alias("id_b")), "shingle")
            .filter(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
        full = sh.select("doc_id", "shingles", "n_shingles")
        cand = cand.join(
            full.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"),
                        F.col("n_shingles").alias("na")), "id_a"
        ).join(
            full.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"),
                        F.col("n_shingles").alias("nb")), "id_b"
        )
        inter = F.size(F.array_intersect("sh_a", "sh_b"))
        jac = inter / (F.col("na") + F.col("nb") - inter)
        return cand.withColumn("jaccard", jac).filter(F.col("jaccard") >= threshold).select(
            "id_a", "id_b", "jaccard"
        )
    a = posts.select(
        F.col("shingle"), F.col("doc_id").alias("id_a"), F.col("n_shingles").alias("na")
    )
    b = posts.select(
        F.col("shingle"), F.col("doc_id").alias("id_b"), F.col("n_shingles").alias("nb")
    )
    pairs = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.count("*").alias("inter"))
    )
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return pairs.withColumn("jaccard", jac).filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "jaccard"
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signature(docs: DataFrame, n_perm: int = 16, n: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, sig: array<string>) — md5-based minhash, oracle-portable."""
    sh = _shingled(docs, text_col, id_col, n)
    sig = F.array(*[minhash_expr(F.col("shingles"), p) for p in range(n_perm)])
    return sh.select("doc_id", "n_shingles", "shingles", sig.alias("sig"))


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n_perm: int = 16,
    bands: int = 4,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Candidate pairs share ≥1 LSH band of the minhash signature; each
    candidate verified with exact shingle Jaccard (so the output has no
    false positives; banding only bounds recall).

    The signature is materialized ONCE (lazy localCheckpoint) before the
    pair query scans it three times (banding + the two shingle-attach
    joins) — without the pin the 16-perm md5 signature is recomputed per
    scan (measured 25.7 s → 9 s at sf0.1).  The real scale path persists
    signatures per wave instead (operators/dedup_state.py); this is the
    convenience form for one-shot corpora."""
    sig = minhash_signature(docs, n_perm, n, text_col, id_col).localCheckpoint(eager=False)
    return minhash_pairs_from_signatures(sig, threshold, n_perm, bands)


def minhash_pairs_from_signatures(
    sig: DataFrame,
    threshold: float = 0.5,
    n_perm: int = 16,
    bands: int = 4,
    new_ids: DataFrame | None = None,
) -> DataFrame:
    """Pair generation over a PRE-COMPUTED signature table (the persisted
    dedup-state path — signatures/shingles computed once per doc per
    wave, stored append-only, never re-derived from raw text; see
    operators/dedup_state.py).  ``sig`` = minhash_signature output
    (doc_id, n_shingles, shingles, sig).

    ``new_ids`` (doc_id) restricts output to pairs touching at least one
    new doc — the incremental wave pattern: wave N+1 checks only its new
    docs against all history instead of recomputing every historic pair.
    """
    rows_per_band = n_perm // bands
    band_keys = F.array(
        *[
            F.md5(F.concat_ws("|", F.lit(bi), *[F.col("sig")[bi * rows_per_band + r] for r in range(rows_per_band)]))
            for bi in range(bands)
        ]
    )
    # the band self-join carries ONLY (doc_id, band) — shingle arrays are
    # attached after candidate dedup, so the shuffle stays narrow even
    # when documents (and their shingle sets) are large.
    # ZERO-shingle docs are excluded from banding: their per-perm minhash
    # is NULL, concat_ws skips NULLs, and every band key degenerates to
    # md5(str(band)) — f empty docs would emit f²·bands candidate rows
    # (the same quadratic blowup the simhash empty-band guard kills);
    # their Jaccard is undefined (0/0) so they can never be output pairs.
    banded = sig.filter(F.col("n_shingles") > 0).select(
        "doc_id", F.explode(band_keys).alias("band")
    )
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), "band")
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    if new_ids is not None:
        # incremental: keep pairs with ≥1 new member (history×history
        # pairs were emitted by earlier waves).  Two EQUI semi-joins + a
        # pair-key dedup — an OR-predicate semi-join would plan as a
        # nested-loop over every candidate
        newk = new_ids.select(F.col(new_ids.columns[0])).distinct()
        ka = cand.join(newk.withColumnRenamed(newk.columns[0], "id_a"), "id_a", "left_semi")
        kb = cand.join(newk.withColumnRenamed(newk.columns[0], "id_b"), "id_b", "left_semi")
        cand = ka.unionByName(kb).dropDuplicates(["id_a", "id_b"])
    sh = sig.select("doc_id", "shingles", "n_shingles")
    cand = cand.join(
        sh.select(
            F.col("doc_id").alias("id_a"),
            F.col("shingles").alias("sh_a"),
            F.col("n_shingles").alias("na"),
        ),
        "id_a",
    ).join(
        sh.select(
            F.col("doc_id").alias("id_b"),
            F.col("shingles").alias("sh_b"),
            F.col("n_shingles").alias("nb"),
        ),
        "id_b",
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter / (F.col("na") + F.col("nb") - inter)
    return cand.withColumn("jaccard", jac).filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "jaccard"
    )


# ---------------------------------------------------------------------------
# banded Hamming LSH (shared by SimHash variants + pHash image near-dup)
# ---------------------------------------------------------------------------


def banded_hamming_pairs(
    df: DataFrame,
    max_hamming: int,
    band_bits: int,
    total_bits: int = 64,
    id_col: str = "doc_id",
    hash_col: str = "simhash",
) -> DataFrame:
    """Near-dup pairs by Hamming distance over a banded bit-hash.

    Collision GUARANTEE: a pair within ``max_hamming`` differing bits
    must share at least one band, which requires
    ``total_bits // band_bits`` bands > max_hamming (pigeonhole over the
    banded region; bits beyond bands*band_bits never break a collision).
    Violations raise — a silently lossy geometry was this module's worst
    historical bug.

    Scale tradeoff the guarantee makes explicit: wider max_hamming forces
    narrower bands, and an m-bit band key collides randomly at ~2^-m —
    spurious candidates grow as n²·bands/2^m.  At 10^10-doc scale use the
    classic Manku web-dedup setting (max_hamming=3, band_bits=16: 4 bands
    of 16-bit keys, ~n²/16k spurious pairs) rather than a loose radius;
    the default here (6, 8) favors recall at test/corpus scale.
    """
    n_bands = total_bits // band_bits
    if n_bands <= max_hamming:
        raise ValueError(
            f"banding guarantee violated: {n_bands} bands of {band_bits} bits "
            f"cannot guarantee recall at hamming {max_hamming} (need > {max_hamming} bands)"
        )
    bands = F.array(
        *[
            F.shiftrightunsigned(F.col(hash_col), i * band_bits).bitwiseAND(
                F.lit((1 << band_bits) - 1)
            )
            for i in range(n_bands)
        ]
    )
    banded = df.select(
        F.col(id_col).alias("_id"), F.col(hash_col).alias("_h"),
        F.posexplode(bands).alias("band_idx", "band_val"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    # the hamming test rides INSIDE the join as an extra predicate: the
    # equi-join still hashes/sorts only on (band_idx, band_val), but
    # spurious band collisions are discarded in the join's output
    # iterator instead of being materialized.  On a clustered corpus the
    # band buckets are heavily skewed (measured: 6.7k docs → 28.2M
    # candidate rows, one 3.3k-doc bucket alone = 5.4M) and shipping
    # those rows into the pair dedup's shuffle was ~20 s of the operator;
    # filtered-in-join the dedup sees only true near-dup rows (×bands).
    ham = F.bit_count(F.col("a._h").bitwiseXOR(F.col("b._h")))
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a._id") < F.col("b._id"))
            & (ham <= max_hamming),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            ham.alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return cand.select("id_a", "id_b", "hamming")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_expr(text: Column) -> Column:
    """64-bit SimHash: per-token xxhash64, per-bit majority vote, packed
    into a signed long — all column expressions (F.aggregate over the
    token array; no explode, no Python)."""
    toks = F.array_distinct(tokens_expr(F.lower(text)))
    # per-token ±1 bit votes, bit positions unrolled statically (shift
    # amounts must be literals in Spark)
    bits_per_token = F.transform(
        toks,
        lambda t: F.array(
            *[
                (F.shiftrightunsigned(F.xxhash64(t), i).bitwiseAND(F.lit(1)).cast("long") * 2 - 1)
                for i in range(64)
            ]
        ),
    )
    votes = F.aggregate(
        bits_per_token,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, bits: F.zip_with(acc, bits, lambda a, v: a + v),
    )
    packed = F.lit(0).cast("long")
    for i in range(64):
        bit_val = F.lit(-(1 << 63) if i == 63 else (1 << i)).cast("long")
        packed = packed.bitwiseXOR(
            F.when(F.element_at(votes, i + 1) > 0, bit_val).otherwise(F.lit(0).cast("long"))
        )
    return packed


def simhash_table(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    include_empty: bool = True,
) -> DataFrame:
    """(doc_id, simhash) — same values as :func:`simhash_expr` but computed
    as explode → groupBy bit-vote sums instead of one giant per-row
    expression tree.  The unrolled transform builds a 64-wide lambda per
    token that codegens into ~30 MB task binaries; this shape keeps each
    expression tiny (64 scalar sums), shuffles once on doc_id with
    map-side combine, and is the scale path."""
    # _spread: the explode + 64 map-side partial sums run in the INPUT
    # partitioning — a narrow scan would pin the whole vote plane to a
    # few cores (measured 3/32 busy at sf0.1)
    toks = _spread(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokens_expr(F.lower(F.col(text_col))))).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    votes = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.shiftrightunsigned(F.col("h"), i).bitwiseAND(F.lit(1)).cast("long") * 2 - 1
            ).alias(f"v{i}")
            for i in range(64)
        ]
    )
    packed = F.lit(0).cast("long")
    for i in range(64):
        bit_val = F.lit(-(1 << 63) if i == 63 else (1 << i)).cast("long")
        packed = packed.bitwiseXOR(
            F.when(F.col(f"v{i}") > 0, bit_val).otherwise(F.lit(0).cast("long"))
        )
    votes = votes.select("doc_id", packed.alias("simhash"))
    if not include_empty:
        return votes
    # docs with zero tokens vanish in the explode; their simhash is 0
    empty = docs.select(F.col(id_col).alias("doc_id")).join(
        votes.select("doc_id"), "doc_id", "left_anti"
    ).withColumn("simhash", F.lit(0).cast("long"))
    return votes.unionByName(empty)


def simhash_table_md5(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Portable 60-bit SimHash: token hash = first 15 hex digits of
    md5(token) (identical in Spark `conv(_,16,10)` and DuckDB
    `('0x'||_)::BIGINT`, so the whole operator is oracle-checkable).
    Same explode → bit-vote groupBy shape as :func:`simhash_table`;
    the md5 costs ~2× an xxhash64, so the xxhash64 variant stays the
    scale default.  Zero-token docs excluded (see simhash_pairs)."""
    bits = 60
    toks = _spread(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokens_expr(F.lower(F.col(text_col))))).alias("tok"),
    ).withColumn("h", F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long"))
    votes = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.shiftrightunsigned(F.col("h"), i).bitwiseAND(F.lit(1)).cast("long") * 2 - 1
            ).alias(f"v{i}")
            for i in range(bits)
        ]
    )
    packed = F.lit(0).cast("long")
    for i in range(bits):
        packed = packed.bitwiseXOR(
            F.when(F.col(f"v{i}") > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    return votes.select("doc_id", packed.alias("simhash"))


def simhash_pairs_md5(
    docs: DataFrame, max_hamming: int = 6, text_col: str = "text", id_col: str = "doc_id",
    band_bits: int = 8,
) -> DataFrame:
    """Portable near-dup pairs: banded LSH over the 60-bit md5 SimHash,
    exact-Hamming verify — the oracle twin of simhash_pairs.  Default
    7×8-bit bands satisfy the collision guarantee for hamming ≤ 6."""
    sh = simhash_table_md5(docs, text_col=text_col, id_col=id_col)
    return banded_hamming_pairs(
        sh, max_hamming=max_hamming, band_bits=band_bits, total_bits=60,
        id_col="doc_id", hash_col="simhash",
    )


def simhash_pairs(
    docs: DataFrame, max_hamming: int = 6, text_col: str = "text", id_col: str = "doc_id",
    band_bits: int = 8,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance; banded like pHash LSH
    so no O(n²) cross join.  Default 8×8-bit bands satisfy the collision
    guarantee for hamming ≤ 7 (the old 4×16 default silently missed
    pairs with 4-6 flips spread across all four bands).

    Zero-token docs are EXCLUDED from banding: every empty/boilerplate-
    blank doc gets simhash 0 and would collide in all bands, turning the
    candidate join quadratic on a real corpus (f² pair rows for f empty
    docs).  Empty docs are exact duplicates of each other by definition —
    route them through exact_dedup instead."""
    sh = simhash_table(docs, text_col=text_col, id_col=id_col, include_empty=False)
    return banded_hamming_pairs(
        sh, max_hamming=max_hamming, band_bits=band_bits, total_bits=64,
        id_col="doc_id", hash_col="simhash",
    )


# ---------------------------------------------------------------------------
# pair list → dedup decision: connected components + canonical doc
# ---------------------------------------------------------------------------


def _free_local_checkpoint(df: DataFrame) -> None:
    """Free the storage blocks behind an (eager) localCheckpoint'd frame.

    ``DataFrame.unpersist()`` is a no-op here — the blocks belong to the
    internal checkpointed RDD inside the LogicalRDD node, which the
    cache manager never registered (verified empirically: blocks survive
    both ``df.unpersist()`` and ``toRdd().unpersist()``).  Best-effort:
    failures are swallowed because the fallback is what happened before
    this helper existed — the driver's ContextCleaner frees the blocks
    at GC time."""
    try:
        df._jdf.queryExecution().logical().rdd().unpersist(False)
    except Exception:
        pass


def dedup_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 50,
) -> DataFrame:
    """(doc_id, canonical_id) — connected components over a near-dup pair
    list, canonical = the component's minimum id.  This is the step that
    turns any of this module's pair generators (minhash / simhash /
    n-gram / embedding) into an actionable keep/drop decision: keep
    ``canonical_id``, drop the rest.

    Spark shape: min-label propagation WITH pointer jumping — each round
    joins the (bidirectional) edge list with the current labels AND lets
    every id adopt its label's label, so labels telescope along chains:
    O(log diameter) rounds, not O(diameter).  Dedup clusters are dense
    and shallow (dups of a common original), so this is 2-4 rounds in
    practice; the jump term is what keeps a pathological shingle-chain
    cluster from turning rounds linear at 10^10.  Lineage is cut with an eager localCheckpoint per round so
    the plan does not grow with iterations (the classic iterative-Spark
    trap).  Docs appearing in no pair are singletons and are NOT
    emitted — a caller wanting them can left-join and coalesce to the
    doc's own id, without paying a full-corpus shuffle here.

    Raises after ``max_iters`` non-converged rounds rather than return a
    silently-partial labeling.
    """
    # pin the edge list ONCE — it is scanned every round, and without the
    # pin each round re-runs the entire upstream pair generator (an LSH
    # pipeline here is several jobs by itself)
    edges = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    ).unionByName(
        pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    ).localCheckpoint()
    labels = (
        edges.select(F.col("src").alias("id")).distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    try:
        for _round in range(max_iters):
            prop = edges.join(labels, edges["src"] == labels["id"]).select(
                F.col("dst").alias("id"), F.col("label"), F.lit(None).cast("long").alias("_old")
            )
            # pointer jumping: each id also adopts its LABEL's label, so a
            # chain's labels telescope — O(log diameter) rounds instead of
            # O(diameter), the property that matters when a boilerplate
            # cluster at 10^10 is a long shingle-chain rather than a star
            jump = (
                labels.alias("l")
                .join(
                    labels.select(
                        F.col("id").alias("_jid"), F.col("label").alias("_jlbl")
                    ),
                    F.col("l.label") == F.col("_jid"),
                )
                .select(
                    F.col("l.id").alias("id"),
                    F.col("_jlbl").alias("label"),
                    F.lit(None).cast("long").alias("_old"),
                )
            )
            # the convergence signal rides in the SAME aggregation as the
            # propagation (_old = the previous round's label, present only
            # on the self row): min(label) < min(_old) ⇔ this id improved.
            # One checkpoint job per round; the changed-check then reads
            # the materialized blocks instead of paying a join job.
            fused = labels.select("id", "label", F.col("label").alias("_old")).unionByName(prop)
            if _round > 0:
                # round 0's jump is the identity (labels start as self) —
                # pure overhead for the common shallow-cluster case
                fused = fused.unionByName(jump)
            new_labels = (
                fused.groupBy("id")
                .agg(F.min("label").alias("label"), F.min("_old").alias("_old"))
            ).localCheckpoint()
            changed = new_labels.filter(F.col("label") < F.col("_old")).limit(1).count()
            # free the superseded round's checkpoint blocks now instead of
            # waiting for driver GC — bounds storage to two generations
            _free_local_checkpoint(labels)
            # keep the RAW checkpointed frame (a .select() wrapper would be
            # a Project node and defeat _free_local_checkpoint next round);
            # the extra _old column is ignored by name-based access above
            labels = new_labels
            if changed == 0:
                return labels.select(
                    F.col("id").alias("doc_id"), F.col("label").alias("canonical_id")
                )
        raise RuntimeError(f"dedup_components: no convergence in {max_iters} rounds")
    finally:
        # the returned labels frame is already materialized in its own
        # checkpoint blocks; the edge list is no longer needed
        _free_local_checkpoint(edges)
