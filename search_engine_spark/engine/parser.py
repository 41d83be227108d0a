"""Structured prefix query-language parser (SURVEY.md §2.9).

A Python re-expression of the reference's stack parser
(hw5/QryEval/QryEval.java:1015-1213) producing a plain AST; the compiler
(compiler.py) lowers it to DataFrame plans. Grammar quirks kept for parity:

- the whole query is ALWAYS wrapped with the model's default operator
  (BM25 -> #SUM, Indri -> #AND, else #OR; QryEval.java:676-681);
- tokens split on whitespace/comma/parens, parens significant (:1030-1031);
- inside #WAND/#WSUM, tokens alternate weight/term: a numeric-looking token
  in weight position pushes the weight stack (:1037-1071); a term or a closed
  sub-operator pops it (:1136-1140, :1171-1199); a *stopword* term pops its
  weight so weights stay aligned (:1171-1177); a NON-numeric token in weight
  position is silently dropped (the dangling `else if` at :1056-1066);
- `term.field` routes to a field (:1159-1199); lexical processing can split
  or erase a term (stopword) — first produced token is used (:1180-1199);
- `#NEAR/k`, `#WINDOW/k` parse the distance after '/' (:1087-1101).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field

from search_engine_spark.config import BM25, INDRI
from search_engine_spark.tokenize import Tokenizer


@dataclass
class QTerm:
    text: str
    field: str | None = None


@dataclass
class QOp:
    name: str  # canonical lowercase: and, or, syn, score, near, sum, window, wand, wsum
    distance: int | None = None
    children: list = dc_field(default_factory=list)
    weights: list = dc_field(default_factory=list)

    @property
    def is_weighted(self) -> bool:
        return self.name in ("wand", "wsum")


_WEIGHT_RE = re.compile(r"^[0-9]*\.?[0-9]*$")  # the reference's weight regex
_TOKEN_RE = re.compile(r"[()]|[^\s,()]+")


def default_wrap(model_name: str) -> str:
    if model_name == BM25:
        return "#SUM"
    if model_name == INDRI:
        return "#AND"
    return "#OR"


def parse_query(
    qstring: str, model_name: str, tokenizer: Tokenizer
) -> QOp:
    """Parse a query line's text (without the `qid:` prefix) into an AST."""
    q = f"{default_wrap(model_name)}({qstring.strip()})"

    stack: list[QOp] = []
    weight_stack: list[float] = []
    last_weight = -1.0
    is_weight = True
    result: QOp | None = None

    for tok in _TOKEN_RE.findall(q):
        top = stack[-1] if stack else None
        is_wop = top is not None and top.is_weighted

        if tok == "(":
            is_weight = True
            continue

        low = tok.lower()

        if is_wop and is_weight and tok != ")":
            # weight position inside #WAND/#WSUM
            if _WEIGHT_RE.match(tok) and tok not in ("", "."):
                weight_stack.append(float(tok))
                is_weight = False
            # else: silently dropped (reference quirk)
            continue

        if low == "#and":
            stack.append(QOp("and"))
        elif low == "#syn":
            stack.append(QOp("syn"))
        elif low == "#or":
            stack.append(QOp("or"))
        elif low == "#score":
            stack.append(QOp("score"))
        elif low.startswith("#near"):
            stack.append(QOp("near", distance=int(tok[tok.index("/") + 1 :])))
        elif low == "#sum":
            stack.append(QOp("sum"))
        elif low.startswith("#window"):
            stack.append(QOp("window", distance=int(tok[tok.index("/") + 1 :])))
        elif low == "#wand":
            stack.append(QOp("wand"))
        elif low == "#wsum":
            stack.append(QOp("wsum"))
        elif tok == ")":
            arg = stack.pop()
            if not stack:
                result = arg
                break
            parent = stack[-1]
            if parent.is_weighted:
                if weight_stack:
                    last_weight = weight_stack.pop()
                parent.weights.append(last_weight)
            parent.children.append(arg)
        else:
            # a (possibly field-qualified) term
            if is_wop:
                is_weight = True
            if "." in tok:
                word_part, fld = tok.split(".", 1)
                fld = fld.lower()  # the analyzer lowercases the whole token
                qualified = True
            else:
                word_part, fld = tok, None
                qualified = False
            words = tokenizer.tokenize(word_part)
            cur = stack[-1]
            if not words:
                # Stopword arity change (SURVEY.md §1.4). Weight handling is
                # asymmetric in the reference: a FIELD-QUALIFIED stopword pops
                # its weight (:1171-1177), a bare stopword does NOT (the
                # `tokenizedWord.length > 0` guard at :1180 skips everything,
                # leaving the weight on the stack).
                if is_wop and qualified and weight_stack:
                    last_weight = weight_stack.pop()
                continue
            term = QTerm(words[0], fld)
            if is_wop:
                if weight_stack:
                    last_weight = weight_stack.pop()
                cur.children.append(term)
                cur.weights.append(last_weight)
            else:
                cur.children.append(term)

    if result is None:
        raise ValueError(f"query syntax is incorrect: {qstring!r}")
    return result
