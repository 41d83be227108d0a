"""High-level engine facade: index + model -> query strings -> ranked results.

The reference's per-query lifecycle (QryEval.java:670-709): wrap with the
model default operator -> parse -> evaluate -> sort desc-score/asc-extid ->
top-100 TREC output. `Engine.search` is that loop for one query.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import DataFrame

from search_engine_spark.config import TOP_K, ModelConfig
from search_engine_spark.engine.compiler import DEFAULT_FIELD, compile_node, evaluate
from search_engine_spark.engine.ops import EvalContext
from search_engine_spark.engine.parser import QOp, QTerm, parse_query
from search_engine_spark.engine.topk import rank_topk, trec_lines
from search_engine_spark.index.build import IndexTables
from search_engine_spark.tokenize import Tokenizer, WHITESPACE_TOKENIZER


def _collect_terms(ast) -> set[str]:
    if isinstance(ast, QTerm):
        return {ast.text}
    out: set[str] = set()
    for c in ast.children:
        out |= _collect_terms(c)
    return out


@dataclass
class Engine:
    index: IndexTables
    model: ModelConfig = ModelConfig()
    tokenizer: Tokenizer = WHITESPACE_TOKENIZER
    default_field: str = DEFAULT_FIELD
    _ctx: EvalContext | None = dc_field(default=None, repr=False)

    @property
    def ctx(self) -> EvalContext:
        if self._ctx is None:
            self._ctx = EvalContext(self.index, self.model)
        return self._ctx

    def parse(self, query: str) -> QOp:
        return parse_query(query, self.model.name, self.tokenizer)

    def scores(self, query: str) -> DataFrame:
        """query text -> (docid, score)."""
        ast = self.parse(query)
        return evaluate(ast, self.ctx, self.default_field)

    def search(self, query: str, k: int = TOP_K) -> DataFrame:
        """query text -> top-k (rank, docid, ext_docid, score)."""
        try:
            # rank_topk collects the ≤k survivors, so the query's action
            # completes inside this call...
            return rank_topk(self.scores(query), self.index.doc_ids, k)
        finally:
            # ...and the composite-#SCORE postings it cached (pinned in
            # Spark's CacheManager, NOT released by Python GC of the AST)
            # can be dropped. `scores()` callers own their own lifecycle:
            # call ctx.release_caches() after collecting.
            self.ctx.release_caches()

    def run_trec(self, queries: list[tuple[str, str]], k: int = TOP_K) -> list[str]:
        """[(qid, text)] -> TREC run lines (with empty-result dummy rows)."""
        lines: list[str] = []
        for qid, text in queries:
            rows = [r.asDict() for r in self.search(text, k).collect()]
            lines.extend(trec_lines(qid, rows))
        return lines
