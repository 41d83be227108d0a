"""Golden parse tests against the reference grammar (SURVEY.md §2.9),
including the weight-stack and stopword quirks of QryEval.java:1015-1213."""

import pytest

from search_engine_spark.config import BM25, INDRI, RANKED_BOOLEAN
from search_engine_spark.engine.parser import QOp, QTerm, parse_query
from search_engine_spark.tokenize import CODE_TOKENIZER, WHITESPACE_TOKENIZER


def terms(node):
    return [(c.text, c.field) for c in node.children if isinstance(c, QTerm)]


def test_default_wrap_by_model():
    assert parse_query("a b", BM25, WHITESPACE_TOKENIZER).name == "sum"
    assert parse_query("a b", INDRI, WHITESPACE_TOKENIZER).name == "and"
    assert parse_query("a b", RANKED_BOOLEAN, WHITESPACE_TOKENIZER).name == "or"


def test_nested_ops_and_distance():
    ast = parse_query(
        "#AND(#NEAR/3(a b) #WINDOW/8(c d) #SYN(e f))", RANKED_BOOLEAN,
        WHITESPACE_TOKENIZER,
    )
    inner = ast.children[0]
    assert inner.name == "and"
    assert [c.name for c in inner.children] == ["near", "window", "syn"]
    assert inner.children[0].distance == 3
    assert inner.children[1].distance == 8


def test_field_qualification_and_lowercase():
    ast = parse_query("Apple.Title banana", RANKED_BOOLEAN, WHITESPACE_TOKENIZER)
    assert ast.name == "or"
    assert terms(ast) == [("apple", "title"), ("banana", None)]


def test_weights_alternate_in_wand():
    ast = parse_query("#WAND(0.7 a 0.2 b 0.1 c)", INDRI, WHITESPACE_TOKENIZER)
    w = ast.children[0]
    assert w.name == "wand"
    assert w.weights == [0.7, 0.2, 0.1]
    assert terms(w) == [("a", None), ("b", None), ("c", None)]


def test_weight_for_suboperator():
    ast = parse_query("#WSUM(0.4 #AND(a b) 0.6 c)", INDRI, WHITESPACE_TOKENIZER)
    w = ast.children[0]
    assert w.weights == [0.4, 0.6]
    assert w.children[0].name == "and"
    assert w.children[1].text == "c"


def test_bare_stopword_keeps_weight_field_qualified_pops():
    # CODE_TOKENIZER drops 'def'. A field-qualified stopword pops its weight
    # (QryEval.java:1171-1177); a bare stopword leaves it on the stack, so the
    # dangling weight is reused by the next term (:1180 guard skips the pop).
    ast = parse_query("#WAND(0.9 def.path 0.5 a)", INDRI, CODE_TOKENIZER)
    w = ast.children[0]
    assert terms(w) == [("a", None)]
    assert w.weights == [0.5]

    ast2 = parse_query("#WAND(0.9 def 0.5 a)", INDRI, CODE_TOKENIZER)
    w2 = ast2.children[0]
    # 'def' dropped but 0.9 stays queued; 'a' pops 0.5 (LIFO stack top)
    assert terms(w2) == [("a", None)]
    assert w2.weights == [0.5]


def test_stopword_arity_change():
    # #AND(merge def) ≡ #AND(merge): stopword vanishes before construction
    ast = parse_query("#AND(merge def)", RANKED_BOOLEAN, CODE_TOKENIZER)
    inner = ast.children[0]
    assert terms(inner) == [("merge", None)]


def test_unbalanced_raises():
    with pytest.raises(ValueError):
        parse_query("#AND(a b", RANKED_BOOLEAN, WHITESPACE_TOKENIZER)
