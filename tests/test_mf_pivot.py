"""Multi-field Indri pivot plan (ops._indri_pivot_scores_mf) is bit-identical
to the chain-join semantics (scores_with_default cascade) for every weighted
combine, including leaves whose term is absent from its field (ctf=0 default
quirk, QryopSlScore.java:178-195) and docs with no tokens in a leaf's field
(doclen -> 0)."""

from __future__ import annotations

import pytest

from search_engine_spark.config import INDRI, ModelConfig
from search_engine_spark.engine.compiler import compile_node
from search_engine_spark.engine.ops import EvalContext, _cand_docids
from search_engine_spark.engine.runner import Engine
from search_engine_spark.tokenize import CODE_TOKENIZER

MF_QUERIES = [
    "#WSUM(0.5 lock.body 0.3 python.lang 0.2 src.path)",
    "#WAND(0.7 queue.body 0.2 go.lang 0.1 parse.path)",
    "#AND(lock.body python.lang)",
    # absent-in-field leaf: 'queue' never appears in the lang field, so its
    # default collapses to 0 via the ctf=0 quirk
    "#WSUM(0.6 lock.body 0.4 queue.lang)",
]


def _both_plans(eng: Engine, q: str):
    node = compile_node(eng.parse(q).children[0], eng.ctx)
    pivot = {r["docid"]: r["score"] for r in node.scores(eng.ctx).collect()}
    cands = _cand_docids(eng.ctx, node.children)
    chain = {
        r["docid"]: r["score"]
        for r in node.scores_with_default(eng.ctx, cands).collect()
    }
    return pivot, chain


@pytest.mark.parametrize("q", MF_QUERIES)
def test_mf_pivot_bit_identical_to_chain(code_index, q):
    eng = Engine(code_index, ModelConfig(name=INDRI), tokenizer=CODE_TOKENIZER)
    pivot, chain = _both_plans(eng, q)
    assert pivot.keys() == chain.keys()
    assert len(pivot) > 0
    diffs = [d for d in pivot if pivot[d] != chain[d]]
    assert diffs == []  # bitwise: both paths share the exact column exprs
