"""Persisted document-dedup state: signatures computed once, stored
append-only, reused across waves.

VERDICT r2 scale caveat: ``minhash_lsh_pairs`` re-derives signatures
from raw text on every run — fine for a one-shot query, wrong
operationally at 100 TB where each crawl wave adds a sliver of new
documents to a huge corpus.  This module extends the catalog's
append-only pattern (sources/catalog.py — the same shape the bloom/seen
tables already use) to dedup state:

* ``minhash_sigs`` — (doc_id, n_shingles, shingles, sig) per wave delta;
* ``simhash`` — (doc_id, simhash) per wave delta.

``update_wave(docs, wave_id)`` computes signatures ONLY for doc_ids not
already in the state (anti-join), then commits the delta.  Pair queries
read the persisted tables — no text re-tokenization — and the
incremental form restricts candidates to pairs touching the newest
wave's docs (history×history pairs were already emitted by the waves
that introduced them).

Geometry (n_perm / bands / shingle n) is stamped in the manifest via the
state table's companion ``meta`` row and checked on resume, mirroring
the bloom geometry guard: signatures built under different parameters
must not silently mix.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.catalog import SnapshotCatalog
from .docdedup import (
    banded_hamming_pairs,
    minhash_pairs_from_signatures,
    minhash_signature,
    simhash_table,
)


class DedupState:
    """Wave-incremental minhash + simhash state over a SnapshotCatalog."""

    def __init__(
        self,
        catalog: SnapshotCatalog,
        n_perm: int = 16,
        bands: int = 4,
        shingle_n: int = 3,
        sim_band_bits: int = 8,
        max_hamming: int = 6,
    ):
        self.catalog = catalog
        self.n_perm = n_perm
        self.bands = bands
        self.shingle_n = shingle_n
        self.sim_band_bits = sim_band_bits
        self.max_hamming = max_hamming
        self._check_geometry()

    # -- geometry guard ----------------------------------------------------
    @property
    def _geom_path(self) -> str:
        return os.path.join(self.catalog.root, "dedup_geometry.json")

    def _geometry(self) -> dict:
        return {
            "n_perm": self.n_perm,
            "bands": self.bands,
            "shingle_n": self.shingle_n,
            "sim_band_bits": self.sim_band_bits,
        }

    def _check_geometry(self) -> None:
        """Signatures from a different (n_perm, bands, shingle_n) are NOT
        comparable — mixing them silently loses pairs.  Same failure
        class as the bloom geometry guard; reject loudly on resume.

        The stamp is only BINDING while signatures actually exist: a
        mismatching (or corrupt) geometry file over an empty state is
        overwritten, so merely constructing a DedupState (CrawlJob does
        lazily) never locks an empty catalog to its parameters."""
        if os.path.exists(self._geom_path):
            try:
                with open(self._geom_path) as f:
                    stored = json.load(f)
            except (ValueError, OSError):
                stored = None  # torn write — rebindable below
            if stored != self._geometry():
                if self.catalog.read("minhash_sigs") is not None:
                    raise ValueError(
                        f"dedup state at {self.catalog.root} was built with "
                        f"{stored}, requested {self._geometry()}; rebuild the "
                        "state (delete the catalog) or match the parameters"
                    )
                self._write_geometry()
        else:
            self._write_geometry()

    def _write_geometry(self) -> None:
        tmp = self._geom_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._geometry(), f)
        os.replace(tmp, self._geom_path)  # atomic, like the manifest

    # -- updates -----------------------------------------------------------
    def wave_deltas(
        self,
        docs: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> tuple[dict[str, DataFrame], int]:
        """Signature deltas for docs whose ids are NOT already in the
        state — ({table: delta_df}, n_new); ({}, 0) when nothing is new.
        Callers either commit them via :meth:`update_wave` or merge them
        into a larger snapshot commit (CrawlJob does the latter so the
        crawl's manifest rename stays the single atomic commit point)."""
        # re-bind/verify at WRITE time, not only at construction: another
        # DedupState instance may have re-stamped an empty catalog since
        # this one was built — committing signatures under a stamp that
        # doesn't match these parameters is the silent pair-loss case
        self._check_geometry()
        known = self.known_ids()
        fresh = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
        if known is not None:
            fresh = fresh.join(known, "doc_id", "left_anti")
        # one pass over the new docs' text: signatures + simhash; pinned
        # so the count and both writes don't re-run the scan
        fresh = fresh.localCheckpoint(eager=True)
        n_new = fresh.count()
        if n_new == 0:
            return {}, 0
        sigs = minhash_signature(fresh, self.n_perm, self.shingle_n)
        simh = simhash_table(fresh, include_empty=True)
        return {"minhash_sigs": sigs, "simhash": simh}, n_new

    def update_wave(
        self,
        docs: DataFrame,
        wave_id: int,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> dict:
        """Compute + append signatures for docs whose ids are NOT already
        in the state.  Returns {'new_docs': n} (0 ⇒ nothing written)."""
        deltas, n_new = self.wave_deltas(docs, text_col, id_col)
        if n_new:
            self.catalog.commit_wave(wave_id, appends=deltas)
        return {"new_docs": n_new}

    def known_ids(self) -> DataFrame | None:
        sigs = self.catalog.read("minhash_sigs")
        return None if sigs is None else sigs.select("doc_id")

    def signatures(self) -> DataFrame | None:
        return self.catalog.read("minhash_sigs")

    def simhashes(self) -> DataFrame | None:
        return self.catalog.read("simhash")

    # -- pair queries ------------------------------------------------------
    def minhash_pairs(
        self, threshold: float = 0.5, new_ids: DataFrame | None = None
    ) -> DataFrame:
        """Near-dup pairs from the PERSISTED signatures (no text rescan).
        ``new_ids`` restricts to pairs touching those docs — pass the
        latest wave's ids for the incremental per-wave check."""
        sig = self.signatures()
        if sig is None:
            raise ValueError("no dedup state committed yet")
        return minhash_pairs_from_signatures(
            sig, threshold, self.n_perm, self.bands, new_ids=new_ids
        )

    def simhash_pairs(self, new_ids: DataFrame | None = None) -> DataFrame:
        sh = self.simhashes()
        if sh is None:
            raise ValueError("no dedup state committed yet")
        banded = sh.filter(F.col("simhash") != 0)  # empty docs never band
        pairs = banded_hamming_pairs(
            banded, max_hamming=self.max_hamming, band_bits=self.sim_band_bits,
            total_bits=64, id_col="doc_id", hash_col="simhash",
        )
        if new_ids is not None:
            newk = new_ids.select(F.col(new_ids.columns[0])).distinct()
            ka = pairs.join(newk.withColumnRenamed(newk.columns[0], "id_a"), "id_a", "left_semi")
            kb = pairs.join(newk.withColumnRenamed(newk.columns[0], "id_b"), "id_b", "left_semi")
            pairs = ka.unionByName(kb).dropDuplicates(["id_a", "id_b"])
        return pairs
