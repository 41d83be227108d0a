"""Live-docs deletes (SURVEY.md §2.2 P3): Lucene-faithful tombstones.

The reference skips deleted docs while materializing a posting list
(hw5/QryEval/InvList.java:84-86, the ``liveDocs`` bitset walk) but reads
every statistic from the index unchanged — in Lucene, ``docFreq``,
``totalTermFreq`` and ``getSumTotalTermFreq`` are NOT delete-aware; only
``numDocs()`` (the N in the BM25 idf, QryopSlScore.java:118) counts live
documents. Deletes here replicate exactly that contract:

- a **tombstones** table (docid) rides next to the packed index; the
  decode paths (``postings_for``, ``doc_terms_for``) and the doc dimension
  tables drop tombstoned docids;
- ``corpus.n_docs`` becomes the live count (numDocs semantics);
- ``df``/``ctf``/``avgdl``/per-field sums stay STALE until a compaction
  rewrites the affected data — the same stale-until-merge behavior a
  Lucene index exhibits.

``delete_docs`` is an O(tombstones) metadata operation: no posting block
is touched. The table swaps in atomically (write-aside + rename, the same
pattern as the append's term_stats swap) and the manifest lineage logs
every delete generation with counters.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from search_engine_spark.index.persist import Manifest

TOMBSTONES = "tombstones"


def tombstones_path(out_dir: str) -> str:
    return os.path.join(out_dir, TOMBSTONES)


def delete_docs(
    spark: SparkSession,
    out_dir: str,
    docids: list[int] | None = None,
    ext_docids: list[str] | None = None,
) -> dict:
    """Tombstone the given docs (by internal docid and/or external id).
    Idempotent: re-deleting is a no-op. Returns the committed counters."""
    from search_engine_spark.index.compact import check_not_inflight

    check_not_inflight(out_dir)
    man = Manifest(os.path.join(out_dir, "manifest.json"))
    lin = man.data["lineage"]
    n_docs = int(lin["n_docs"])
    ids = {int(d) for d in (docids or [])}
    if ext_docids:
        rows = (
            spark.read.parquet(f"{out_dir}/doc_ids")
            .where(F.col("ext_docid").isin(list(ext_docids)))
            .select("docid", "ext_docid")
            .collect()
        )
        found = {r["ext_docid"] for r in rows}
        missing = set(ext_docids) - found
        if missing:
            raise ValueError(f"unknown ext_docids: {sorted(missing)[:5]}...")
        ids |= {int(r["docid"]) for r in rows}
    if not ids:
        raise ValueError("nothing to delete")
    bad = [d for d in ids if d < 1 or d > n_docs]
    if bad:
        raise ValueError(f"docids out of range 1..{n_docs}: {sorted(bad)[:5]}")
    # membership check against the on-disk doc_ids table: docids purged by a
    # past compaction (index/compact.py) must not re-enter the tombstone set
    # — live N is n_docs - n_purged - n_deleted, so a ghost tombstone would
    # double-count. (Tombstoned-but-unpurged ids are still present on disk,
    # keeping re-deletes idempotent.)
    present = {
        int(r["docid"])
        for r in spark.read.parquet(f"{out_dir}/doc_ids")
        .where(F.col("docid").isin([int(d) for d in ids]))
        .select("docid")
        .collect()
    }
    ghosts = sorted(ids - present)
    if ghosts:
        raise ValueError(f"docids not in the index (purged?): {ghosts[:5]}")

    t_dir = tombstones_path(out_dir)
    new = spark.createDataFrame([(d,) for d in sorted(ids)], "docid long")
    if os.path.exists(t_dir):
        new = spark.read.parquet(t_dir).unionByName(new)
    merged = new.distinct().coalesce(1)
    tmp = t_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    merged.write.parquet(tmp)
    total = spark.read.parquet(tmp).count()
    shutil.rmtree(t_dir, ignore_errors=True)
    os.replace(tmp, t_dir)

    entry = {
        "generation": len(lin.get("deletes", [])) + 1,
        "n_requested": len(ids),
        "n_deleted_total": total,
        "ts": time.time(),
    }
    man.set_lineage(
        n_deleted=total, deletes=lin.get("deletes", []) + [entry]
    )
    return entry
