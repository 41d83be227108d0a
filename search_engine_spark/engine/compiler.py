"""Lower a parsed query AST to operator nodes / DataFrame plans.

Model dispatch mirrors the reference's evaluate() type switches:
- #AND   -> AndBoolNode (Boolean) or IndriAndNode (Indri); invalid for BM25
             (QryopSlAnd.evaluate returns null for BM25)
- #SUM   -> BM25 only (QryopSlSum.java:39-42)
- #OR    -> Boolean only (QryopSlOr.java:19-26)
- #WAND/#WSUM -> Indri only (QryopSlWand.java:56-61)
- any Il child of an Sl operator is wrapped in #SCORE (QryopSl.java:31-32)

Spark-first fast path: a "flat" #SUM/#OR/#AND whose children are all term
leaves compiles to ONE postings scan (`(term,field) IN (...)` — bucket-pruned)
with the per-term score as a codegen'd expression over the denormalized
df/ctf/doclen columns, then a single partial+final hash aggregation by docid.
That is the whole BM25 BOW plan: scan -> expression -> agg. The general path
(composite children) falls back to per-child frames + union/join, which is
what the reference always does.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.config import (
    BM25,
    INDRI,
    RANKED_BOOLEAN,
    UNRANKED_BOOLEAN,
)
from search_engine_spark.engine import score as score_mod
from search_engine_spark.engine.ops import (
    AndBoolNode,
    EvalContext,
    IlNode,
    IndriAndNode,
    NearNode,
    OrNode,
    ScoreNode,
    SlNode,
    SumNode,
    SynNode,
    TermNode,
    WandNode,
    WindowNode,
    WsumNode,
)
from search_engine_spark.engine.parser import QOp, QTerm

DEFAULT_FIELD = "body"


def compile_node(ast, ctx: EvalContext, default_field: str = DEFAULT_FIELD):
    """AST -> node tree. Returns an IlNode or SlNode."""
    if isinstance(ast, QTerm):
        return TermNode(ast.text, ast.field or default_field)
    assert isinstance(ast, QOp)
    kids = [compile_node(c, ctx, default_field) for c in ast.children]

    def as_il(children):
        for c in children:
            if not isinstance(c, IlNode):
                raise ValueError(
                    f"#{ast.name.upper()} requires inverted-list arguments"
                )
        return children

    def as_sl(children):
        # implicit Il -> Sl coercion (QryopSl.java:31-32)
        return [ScoreNode(c) if isinstance(c, IlNode) else c for c in children]

    name = ast.name
    model = ctx.model.name
    if name == "syn":
        return SynNode(as_il(kids))
    if name == "near":
        return NearNode(ast.distance, as_il(kids))
    if name == "window":
        return WindowNode(ast.distance, as_il(kids))
    if name == "score":
        (child,) = as_il(kids)
        return ScoreNode(child)
    def identity_if_single(children):
        # single-argument combine = the argument, EXACTLY: Indri #AND is
        # pow(s, 1/1) (Math.pow(x,1.0)==x), #SUM of one is s, #OR max of
        # one is s, Boolean #AND min of one is s. The per-query model
        # default wrap (#AND(q)/#SUM(q)/#OR(q), QryEval.java:676-681)
        # otherwise nests an operator query as a 1-child combine and pushes
        # it off the flat single-aggregation fast path (measured 19 Spark
        # jobs instead of 5 for a wrapped #WAND).
        return children[0] if len(children) == 1 else None

    if name == "and":
        if model == INDRI:
            kids = as_sl(kids)
            return identity_if_single(kids) or IndriAndNode(kids)
        if model in (UNRANKED_BOOLEAN, RANKED_BOOLEAN):
            kids = as_sl(kids)
            return identity_if_single(kids) or AndBoolNode(kids)
        raise ValueError("#AND is not defined for BM25 (QryopSlAnd.evaluate)")
    if name == "or":
        if model not in (UNRANKED_BOOLEAN, RANKED_BOOLEAN):
            raise ValueError("#OR is only defined for Boolean models (QryopSlOr.java:19-26)")
        kids = as_sl(kids)
        return identity_if_single(kids) or OrNode(kids)
    if name == "sum":
        if model != BM25:
            raise ValueError("#SUM is only defined for BM25 (QryopSlSum.java:39-42)")
        kids = as_sl(kids)
        return identity_if_single(kids) or SumNode(kids)
    if name == "wand":
        if model != INDRI:
            raise ValueError("#WAND requires the Indri model")
        return WandNode(list(ast.weights), as_sl(kids))
    if name == "wsum":
        if model != INDRI:
            raise ValueError("#WSUM requires the Indri model")
        return WsumNode(list(ast.weights), as_sl(kids))
    raise ValueError(f"unknown operator #{name}")


# --------------------------------------------------------------------------
# flat-BOW fast path
# --------------------------------------------------------------------------


def _flat_term_leaves(node) -> list[TermNode] | None:
    """If every child is #SCORE(term-leaf), return the leaves, else None."""
    leaves = []
    for c in node.children:
        if isinstance(c, ScoreNode) and isinstance(c.child, TermNode):
            leaves.append(c.child)
        else:
            return None
    return leaves or None


def _leaf_score_col(ctx: EvalContext, fields: set[str]):
    """Per-row score expression over the postings columns (tf, df, ctf,
    doclen) — df/ctf/doclen are denormalized on the postings row so no join
    is needed. Per-field constants (avgdl, corpus length) become a CASE over
    the field column (fields are few and fixed)."""
    m = ctx.model
    if m.name == UNRANKED_BOOLEAN:
        return score_mod._f32(score_mod.unranked_boolean_score())
    if m.name == RANKED_BOOLEAN:
        return score_mod._f32(score_mod.ranked_boolean_score())
    if m.name == BM25:
        expr = None
        for fld in sorted(fields):
            col = score_mod.bm25_score(
                n_docs=ctx.index.corpus.n_docs,
                df=F.col("df"),
                avgdl=ctx.index.corpus.avgdl(fld),
                p=m.bm25,
            )
            expr = (
                col
                if expr is None
                else F.when(F.col("field") == fld, col).otherwise(expr)
            )
        return expr
    if m.name == INDRI:
        expr = None
        for fld in sorted(fields):
            col = score_mod.indri_score(
                ctf=F.col("ctf"),
                c_len=ctx.index.corpus.sum_doclen(fld),
                p=m.indri,
            )
            expr = (
                col
                if expr is None
                else F.when(F.col("field") == fld, col).otherwise(expr)
            )
        return expr
    raise ValueError(m.name)


def _flat_scan(ctx: EvalContext, leaves: list[TermNode]) -> DataFrame:
    """One postings scan covering all (term, field) leaf pairs, with the
    per-term score as a single expression column."""
    pairs = {(l.term, l.field) for l in leaves}
    fields = {f for _, f in pairs}
    scan = ctx.index.postings_for(sorted(pairs))
    return scan.select(
        "docid", "term", "field", _leaf_score_col(ctx, fields).alias("score")
    )


def try_flat_indri(ctx: EvalContext, node) -> DataFrame | None:
    """Fast-path for flat Indri #AND / #WAND / #WSUM over single-field term
    leaves: ONE postings scan + ONE hash aggregate pivoting each term's tf
    into a column, then the per-child score as
    `when(tf_i present, f32(indri_score)) otherwise default_score` and the
    combine (geo-mean / weighted product / weighted sum) in child order —
    bit-identical to the general full-outer-join path (ops.py J2/J5/J6) but
    with zero joins: the union-of-candidates IS the groupBy key set.

    At cluster scale this turns a k-way shuffle-join cascade into a single
    partial+final aggregation over the k pruned posting-list scans.
    """
    if ctx.model.name != INDRI:
        return None
    if not isinstance(node, (IndriAndNode, WandNode, WsumNode)):
        return None
    leaves = _flat_term_leaves(node)
    if leaves is None:
        return None
    fields = {l.field for l in leaves}
    if len(fields) != 1:
        return None
    fld = next(iter(fields))
    c_len = ctx.index.corpus.sum_doclen(fld)
    p = ctx.model.indri

    pairs = list(dict.fromkeys((l.term, l.field) for l in leaves))
    ctx.prefetch_terms(set(pairs))
    aggs = [
        F.max(F.when(F.col("term") == t, F.col("tf"))).alias(f"_tf{j}")
        for j, (t, _) in enumerate(pairs)
    ]
    base = (
        ctx.index.postings_for(pairs)
        .select("docid", "term", "tf", "doclen")
        .groupBy("docid")
        .agg(*aggs, F.max("doclen").alias("doclen"))
    )

    col_by_pair = {}
    for j, (t, f) in enumerate(pairs):
        _, ctf = ctx.term_stat(t, f)
        tf_col = F.col(f"_tf{j}")
        actual = score_mod.indri_score(
            ctf=ctf, c_len=c_len, p=p, tf=tf_col, doclen=F.col("doclen")
        )
        default = score_mod.indri_default_score(
            ctf=ctf, c_len=c_len, p=p, doclen=F.col("doclen")
        )
        col_by_pair[(t, f)] = F.when(tf_col.isNotNull(), actual).otherwise(default)
    child_cols = [col_by_pair[(l.term, l.field)] for l in leaves]

    if isinstance(node, IndriAndNode):
        prod = reduce(lambda a, b: a * b, child_cols)
        expr = F.pow(prod, F.lit(1.0 / len(child_cols)))
    elif isinstance(node, WandNode):
        W = float(sum(node.weights))
        if W == 0:
            return None  # all-zero weights: general path handles the NaN case
        expr = F.lit(1.0)
        for c, w in zip(child_cols, node.weights):
            expr = expr * F.pow(c, F.lit(w / W))
    else:  # WsumNode
        W = float(sum(node.weights))
        if W == 0:
            return None
        expr = F.lit(0.0)
        for c, w in zip(child_cols, node.weights):
            expr = expr + c * F.lit(w / W)
    return base.select("docid", expr.alias("score"))


def try_flat_scores(ctx: EvalContext, node) -> DataFrame | None:
    """Fast-path scores() for flat #SUM / #OR / #AND. Returns None when the
    shape doesn't apply; semantics identical to the general path."""
    if not isinstance(node, (SumNode, OrNode, AndBoolNode)):
        return try_flat_indri(ctx, node)
    leaves = _flat_term_leaves(node)
    if leaves is None:
        return None
    scored = _flat_scan(ctx, leaves)

    if isinstance(node, SumNode):
        # duplicate query terms contribute once per occurrence
        from collections import Counter

        mult = Counter((l.term, l.field) for l in leaves)
        if any(v > 1 for v in mult.values()):
            mexpr = F.lit(1.0)
            for (t, f), v in mult.items():
                if v > 1:
                    mexpr = F.when(
                        (F.col("term") == t) & (F.col("field") == f),
                        F.lit(float(v)),
                    ).otherwise(mexpr)
            scored = scored.withColumn("score", F.col("score") * mexpr)
        return scored.groupBy("docid").agg(F.sum("score").alias("score"))

    if isinstance(node, OrNode):
        return scored.groupBy("docid").agg(F.max("score").alias("score"))

    # AndBoolNode: membership in every distinct (term, field)
    k = len({(l.term, l.field) for l in leaves})
    agged = (
        scored.groupBy("docid")
        .agg(F.count("*").alias("_n"), F.min("score").alias("_min"))
        .where(F.col("_n") == k)
    )
    if ctx.model.name == RANKED_BOOLEAN:
        return agged.select("docid", F.col("_min").alias("score"))
    return agged.select("docid", F.lit(1.0).alias("score"))


def evaluate(ast, ctx: EvalContext, default_field: str = DEFAULT_FIELD) -> DataFrame:
    """AST -> (docid, score) DataFrame, taking the flat fast path when it
    applies."""
    node = compile_node(ast, ctx, default_field)
    if isinstance(node, IlNode):
        node = ScoreNode(node)
    fast = try_flat_scores(ctx, node)
    if fast is not None:
        return fast
    return node.scores(ctx)
