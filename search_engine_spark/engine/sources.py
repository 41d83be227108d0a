"""Initial-ranking source (SURVEY.md §2.1 S6): parse a prior TREC run file
into per-query score lists.

Reference: ``fbInitialRankingFile`` handling, hw5/QryEval/QryEval.java:618-657
— lines ``qid Q0 extid rank score runid`` split on spaces, grouped by qid in
file order, external ids resolved to internal docids
(getInternalDocid, :991-1004). Feeds the PRF expansion path (the initial
ranking replaces round one) and, generally, any reranker's candidate list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def parse_trec_run(lines) -> dict[str, list[tuple[str, float]]]:
    """TREC run lines -> qid -> [(ext_id, score)] in file order
    (QryEval.java:632-653 preserves read order per query)."""
    out: dict[str, list[tuple[str, float]]] = {}
    for line in lines:
        line = line.strip()
        if not line:
            continue
        # whitespace-delimited like the reference's Scanner tokenization —
        # column-aligned runs use multiple spaces / tabs between fields
        parts = line.split()
        qid, ext_id, score = parts[0], parts[2], float(parts[4])
        out.setdefault(qid, []).append((ext_id, score))
    return out


def resolve_run(
    run: dict[str, list[tuple[str, float]]], doc_ids: DataFrame
) -> dict[str, list[tuple[int, str, float]]]:
    """ext ids -> internal docids via ONE broadcast-style lookup against the
    doc_ids dimension (the reference does a per-id TermQuery point lookup,
    ExtDocId.java:14-19; here one filtered scan covers every id). Unknown
    ext ids raise, like getInternalDocid's "no documents" error path.
    Returns qid -> [(docid, ext_id, score)] in file order."""
    from pyspark.sql import functions as F

    all_ext = {e for rows in run.values() for e, _ in rows}
    if not all_ext:
        return {}
    mapping = {
        r["ext_docid"]: r["docid"]
        for r in doc_ids.where(F.col("ext_docid").isin(list(all_ext))).collect()
    }
    missing = all_ext - set(mapping)
    if missing:
        raise ValueError(f"unknown external docids in run file: {sorted(missing)[:5]}")
    return {
        qid: [(mapping[e], e, s) for e, s in rows] for qid, rows in run.items()
    }


def read_trec_run_file(path: str, doc_ids: DataFrame):
    with open(path) as f:
        return resolve_run(parse_trec_run(f), doc_ids)
