"""Block-max pruned BM25 top-k over the packed index (SURVEY.md §4.2).

The reference has NO query-time pruning (its `#WAND` is Indri's weighted-AND,
not Broder's algorithm; the top-100 cut happens at output —
hw5/QryEval/QryEval.java:1272). Block-max pruning is OUR scale-path
optimization, with an exact fallback and identity tests: the pruned result is
bit-identical to the exact plan's.

Spark-friendly two-phase block-max/MaxScore variant (the classic cursor-based
BMW is doc-at-a-time and doesn't distribute):

  0. Driver reads the query terms' tiny block METADATA (column-pruned scan of
     the packed table: term, salt, block_id, docid range, max_tf, min_doclen
     — no binary columns touched). Per block, an upper bound on any BM25
     contribution in it:
         ub = idf(df) · max_tf / (max_tf + k1·((1−b) + b·min_doclen/avgdl))
     valid because tfW is increasing in tf and decreasing in doclen.
  1. Docid space is cut into the ranges induced by all block boundaries
     (blocks are docid-contiguous). For each range R:
         UB(R) = Σ_t max(ub of t's blocks overlapping R)
     — an upper bound on ANY doc's total score inside R.
  2. Phase 1 (seed): exactly score the ranges with the highest UB until they
     cover ≥ k postings of the highest-ub term ⇒ θ = k-th best exact score.
  3. Phase 2: survivors = ranges with UB(R) > θ not yet scored. Exactly score
     them, merge with phase 1, emit top-k. Any doc outside survivors has
     total score ≤ UB(R) ≤ θ — provably outside the top-k (ties: equal-score
     docs may differ from the exact plan only when θ has >k docs ≥ it; we
     guard by using strict > for pruning and re-sorting with the §2.6
     tie-break over the union).

At 10^12-file scale the metadata for a query's terms is df/block_size rows
per term — MBs, not GBs; the exact scoring scans read ONLY surviving blocks
(a broadcast semi-join on (term, salt, block_id)).

float32 guard: exact per-term scores are float32-rounded (QryopSlScore
contract). float32 rounding can exceed the double upper bound by ≤ 1 ulp;
ub is inflated by (1 + 2⁻²⁰) to stay a true upper bound.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from search_engine_spark.config import BM25Params
from search_engine_spark.engine.topk import rank_topk
from search_engine_spark.index.persist import PackedIndex

_F32_GUARD = 1.0 + 2.0**-20


@dataclass
class PruneStats:
    n_blocks_total: int = 0
    n_blocks_scanned: int = 0
    n_ranges_total: int = 0
    n_ranges_scanned: int = 0
    theta: float = 0.0


def _idf(n_docs: int, df: int) -> float:
    return max(0.0, math.log((n_docs - df + 0.5) / (df + 0.5)))


def _block_ub(max_tf: int, min_doclen: int, idf: float, avgdl: float, p: BM25Params) -> float:
    tfw = max_tf / (max_tf + p.k1 * ((1.0 - p.b) + p.b * min_doclen / avgdl))
    return idf * tfw * _F32_GUARD


def bm25_topk_pruned(
    pidx: PackedIndex,
    terms: list[str],
    k: int = 100,
    fld: str = "body",
    p: BM25Params | None = None,
    stats: PruneStats | None = None,
) -> DataFrame:
    """Exact BM25 #SUM top-k using block-max pruning. Returns the same
    (rank, docid, ext_docid, score) frame as the unpruned plan."""
    p = p or BM25Params()
    st = stats if stats is not None else PruneStats()
    spark = pidx.spark
    n_docs = pidx.corpus.n_docs
    avgdl = pidx.corpus.avgdl(fld)

    pairs = [(t, fld) for t in dict.fromkeys(terms)]
    trows = (
        {
            r["term"]: (r["df"], r["ctf"])
            for r in pidx.term_stats.where(pidx._stats_cond(pairs)).collect()
        }
        if pairs
        else {}
    )
    live_terms = [t for t, _ in pairs if t in trows]
    if not live_terms:
        # all-stopword or absent-term query: same empty top-k the exact
        # plan produces (the TREC sink then emits its dummy row)
        return rank_topk(
            spark.createDataFrame([], "docid long, score double"),
            pidx.doc_ids, k, n_docs=n_docs,
        )

    # ---- 0. block metadata (driver-side; tiny, column-pruned) ------------
    meta = pidx.blocks_meta([(t, fld) for t in live_terms]).collect()
    st.n_blocks_total = len(meta)
    blocks: dict[str, list] = {t: [] for t in live_terms}
    for r in meta:
        idf = _idf(n_docs, trows[r["term"]][0])
        ub = _block_ub(r["max_tf"], r["min_doclen"], idf, avgdl, p)
        blocks[r["term"]].append(
            (r["min_docid"], r["max_docid"], r["salt"], r["block_id"], ub)
        )

    # ---- 1. docid ranges from the union of block boundaries --------------
    cuts = sorted(
        {b[0] for bl in blocks.values() for b in bl}
        | {b[1] + 1 for bl in blocks.values() for b in bl}
    )
    ranges = list(zip(cuts[:-1], [c - 1 for c in cuts[1:]]))  # inclusive
    st.n_ranges_total = len(ranges)

    range_ub = []
    per_range_blocks: list[list] = []
    for lo, hi in ranges:
        tot = 0.0
        rb = []
        for t in live_terms:
            best = 0.0
            for b in blocks[t]:
                if b[0] <= hi and b[1] >= lo:
                    best = max(best, b[4])
                    rb.append((t, b[2], b[3]))
            tot += best
        range_ub.append(tot)
        per_range_blocks.append(rb)

    # ---- 2. seed phase: best ranges by UB until the seed is guaranteed to
    # contain >= k distinct docids. A single term's postings are distinct
    # docs, so we count UNIQUE blocks per term and stop once one term's
    # covered postings reach k (counting across terms under-seeds: 100
    # postings of 3 terms can be ~40 docs, leaving theta at -inf and the
    # prune phase vacuous — the r03 13/13-blocks-scanned failure mode).
    order = sorted(range(len(ranges)), key=lambda i: -range_ub[i])
    block_n = {
        (r["term"], r["salt"], r["block_id"]): r["n"] for r in meta
    }
    term_posts: dict[str, int] = {}
    counted: set = set()
    pos = 0

    def take_ranges(min_ranges: int, until_k_posts: bool = False) -> list[int]:
        """Next ranges in UB order: at least min_ranges, and (seed call)
        extending until one term's unique-block posting count reaches k."""
        nonlocal pos
        batch: list[int] = []
        while pos < len(order) and (
            len(batch) < min_ranges or (until_k_posts and not counted_enough())
        ):
            i = order[pos]
            pos += 1
            batch.append(i)
            for key in per_range_blocks[i]:
                if key not in counted:
                    counted.add(key)
                    term_posts[key[0]] = term_posts.get(key[0], 0) + block_n[key]
        return batch

    # seed target: 2k postings of one term, floored at ~2 blocks — a seed at
    # exactly k docs leaves theta at the k-th best of a BARELY sufficient
    # sample; doubling the sample tightens theta for the cost of a couple of
    # extra blocks, typically halving the survivor set
    seed_target = max(2 * k, 2 * max(block_n.values()))

    def counted_enough() -> bool:
        return bool(term_posts) and max(term_posts.values()) >= seed_target

    seen_blocks: set = set()

    def score_ranges(idxs: list[int]) -> DataFrame:
        keys = sorted({key for i in idxs for key in per_range_blocks[i]})
        # count UNIQUE blocks touched: a block spanning both a seed range and
        # a survivor range is physically re-read by the second pass, but the
        # pruning metric (scanned vs total) is about coverage, not I/O passes
        st.n_blocks_scanned += len(set(keys) - seen_blocks)
        seen_blocks.update(keys)
        bf = spark.createDataFrame(
            [(t, fld, s, b) for t, s, b in keys],
            "term string, field string, salt int, block_id int",
        )
        posts = pidx.postings_for(
            [(t, fld) for t in live_terms], block_filter=bf
        )
        from search_engine_spark.engine.score import bm25_score

        lo_hi = [ranges[i] for i in idxs]
        cond = None
        for lo, hi in lo_hi:
            c = (F.col("docid") >= lo) & (F.col("docid") <= hi)
            cond = c if cond is None else (cond | c)
        scored = posts.where(cond).select(
            "docid",
            bm25_score(
                n_docs=n_docs, df=F.col("df"), avgdl=avgdl, p=p
            ).alias("score"),
        )
        return scored.groupBy("docid").agg(F.sum("score").alias("score"))

    # minimum 4 ranges: with a small k a single range can satisfy the
    # posting count yet hold only weak docs, leaving theta loose and the
    # prune phase vacuous — a few extra seed ranges cost one filter clause
    seed = take_ranges(4, until_k_posts=True)
    seed_scores = score_ranges(seed).cache()
    st.n_ranges_scanned = len(seed)
    top = seed_scores.orderBy(F.desc("score")).limit(k).collect()
    # top-up: block boundaries can split ranges so the covered-posting count
    # over-estimates the docids actually inside the seed ranges — extend in
    # doubling batches (still UB order, so theta only tightens) until the
    # seed holds k docs or every range is scored. Scores from different
    # ranges are for DISJOINT docids (ranges partition the docid space), so
    # plain unions need no re-aggregation.
    while len(top) < k and pos < len(order):
        extra = take_ranges(max(16, len(seed)))
        seed.extend(extra)
        st.n_ranges_scanned += len(extra)
        seed_scores = seed_scores.unionByName(score_ranges(extra)).cache()
        top = seed_scores.orderBy(F.desc("score")).limit(k).collect()
    theta = top[-1]["score"] if len(top) >= k else -math.inf
    st.theta = theta

    # ---- 3. survivors ----------------------------------------------------
    # prune only UB < θ (strict): a doc with score exactly θ could still beat
    # the seed's k-th entry on the asc-ext-id tie-break, so it must be scored
    seeded = set(seed)
    survivors = [
        i
        for i in range(len(ranges))
        if i not in seeded and range_ub[i] >= theta
    ]
    st.n_ranges_scanned += len(survivors)
    frames = [seed_scores]
    if survivors:
        frames.append(score_ranges(survivors))
    allscores = frames[0] if len(frames) == 1 else frames[0].unionByName(frames[1])
    return rank_topk(allscores, pidx.doc_ids, k, n_docs=n_docs)
