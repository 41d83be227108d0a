"""Final ranking: the rank-identity contract (SURVEY.md §2.6).

Ordering: score DESC, ties broken by external docid ASC (the observable
behavior of the reference's stable sort, hw5/QryEval/ScoreList.java:65-86),
then a top-100 cutoff applied only at output (QryEval.java:1272).

`orderBy(...).limit(k)` compiles to Spark's TakeOrderedAndProject — a
per-partition top-k followed by a driver merge, so no global sort runs even
at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.config import TOP_K

_TOPK_SCHEMA = "rank int, docid long, ext_docid string, score double"


def rank_topk(
    scores: DataFrame, doc_ids: DataFrame, k: int = TOP_K
) -> DataFrame:
    """(docid, score) -> top-k (rank, docid, ext_docid, score).

    doc_ids is the small dimension table — broadcast to avoid shuffling the
    score side. ``orderBy(...).limit(k)`` compiles to TakeOrderedAndProject
    (per-partition top-k, merged on the driver), so the ≤k surviving rows are
    already on the driver; rank is assigned there by enumeration instead of
    an unpartitioned row_number window (which moved all k rows to a single
    task and spammed WindowExec warnings — VERDICT r01 item 10)."""
    order = [F.desc("score"), F.asc("ext_docid")]
    top = (
        scores.join(F.broadcast(doc_ids), "docid")
        .select("docid", "ext_docid", "score")
        .orderBy(*order)
        .limit(k)
    )
    rows = top.collect()  # ≤k rows, already in rank order
    data = [
        (i + 1, r["docid"], r["ext_docid"], float(r["score"]))
        for i, r in enumerate(rows)
    ]
    return scores.sparkSession.createDataFrame(data, _TOPK_SCHEMA)


def trec_lines(qid: str, topk_rows: list, run_id: str = "run-1") -> list[str]:
    """TREC run format (QryEval.java:1252-1285) incl. the dummy row for an
    empty result (:1266-1267)."""
    if not topk_rows:
        return [f"{qid} Q0 dummy 1 0.000000000000 {run_id}"]
    return [
        f"{qid} Q0 {r['ext_docid']} {r['rank']} {r['score']} {run_id}"
        for r in topk_rows
    ]
