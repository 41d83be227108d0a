"""Independent pure-Python oracle implementing the reference semantics.

A dict-based inverted index + the exact scoring formulas of SURVEY.md §2.5
(including the float32 casts of QryopSlScore.java:86,89,134,169) and the
§2.6 tie-break (score DESC, ext id ASC). Deliberately written as a separate
document-at-a-time implementation so the Spark engine and this oracle share
only the tokenizer and parser — everything downstream is computed twice,
independently.
"""

from __future__ import annotations

import math

import numpy as np

from search_engine_spark.config import (
    BM25,
    INDRI,
    RANKED_BOOLEAN,
    UNRANKED_BOOLEAN,
    ModelConfig,
)
from search_engine_spark.engine.parser import QOp, QTerm, parse_query
from search_engine_spark.tokenize import Tokenizer


def f32(x: float) -> float:
    """The reference's `(float) score` cast: round to float32, keep double."""
    return float(np.float32(x))


class PyOracle:
    def __init__(self, rows, tokenizer: Tokenizer, fields: dict[str, int]):
        """rows: list of tuples; fields maps field name -> tuple index of the
        source text; rows[i][0] = docid, rows[i][1] = ext id."""
        self.tok = tokenizer
        self.n_docs = len(rows)
        self.ext = {}
        # field -> term -> {docid: (tf, positions)}
        self.post: dict[str, dict[str, dict[int, tuple[int, list[int]]]]] = {}
        self.doclen: dict[str, dict[int, int]] = {}
        self.sum_doclen: dict[str, int] = {}
        for fld in fields:
            self.post[fld] = {}
            self.doclen[fld] = {}
            self.sum_doclen[fld] = 0
        for row in rows:
            docid = row[0]
            self.ext[docid] = row[1]
            for fld, idx in fields.items():
                toks = tokenizer.tokenize(row[idx])
                if not toks:
                    continue
                self.doclen[fld][docid] = len(toks)
                self.sum_doclen[fld] += len(toks)
                for pos, t in enumerate(toks):
                    tfp = self.post[fld].setdefault(t, {}).setdefault(
                        docid, (0, [])
                    )
                    self.post[fld][t][docid] = (tfp[0] + 1, tfp[1] + [pos])

    # ---- stats ----
    def df(self, term, fld):
        return len(self.post.get(fld, {}).get(term, {}))

    def ctf(self, term, fld):
        return sum(tf for tf, _ in self.post.get(fld, {}).get(term, {}).values())

    def avgdl(self, fld):
        n = len(self.doclen[fld])
        return self.sum_doclen[fld] / n if n else 0.0

    # ---- inverted-list evaluation (docid -> (tf, positions)) ----
    def eval_il(self, node) -> tuple[dict[int, tuple[int, list[int]]], str]:
        if isinstance(node, QTerm):
            fld = node.field or "body"
            return dict(self.post.get(fld, {}).get(node.text, {})), fld
        assert isinstance(node, QOp)
        kids = [self.eval_il(c) for c in node.children]
        fld = kids[0][1]
        if node.name == "syn":
            out: dict[int, tuple[int, list[int]]] = {}
            for lst, _ in kids:
                for d, (tf, pos) in lst.items():
                    cur = out.get(d, (0, []))
                    out[d] = (cur[0] + tf, sorted(cur[1] + pos))
            return out, fld
        if node.name in ("near", "window"):
            lists = [k[0] for k in kids]
            if len(lists) == 1:
                return lists[0], fld
            common = set(lists[0])
            for lst in lists[1:]:
                common &= set(lst)
            out = {}
            walk = _near_positions if node.name == "near" else _window_positions
            for d in sorted(common):
                plists = [lst[d][1] for lst in lists]
                res = walk(plists, node.distance)
                if res:
                    out[d] = (len(res), res)
            return out, fld
        raise ValueError(f"not an Il op: {node.name}")

    # ---- score evaluation ----
    def _term_scores(self, node, model: ModelConfig) -> dict[int, float]:
        lst, fld = self.eval_il(node)
        df = len(lst)
        ctf = sum(tf for tf, _ in lst.values())
        out = {}
        for d, (tf, _pos) in lst.items():
            if model.name == UNRANKED_BOOLEAN:
                s = 1.0
            elif model.name == RANKED_BOOLEAN:
                s = float(tf)
            elif model.name == BM25:
                p = model.bm25
                idf = max(0.0, math.log((self.n_docs - df + 0.5) / (df + 0.5)))
                dl = self.doclen[fld].get(d, 0)
                tfw = tf / (tf + p.k1 * ((1 - p.b) + p.b * dl / self.avgdl(fld)))
                userw = (p.k3 + 1.0) * 1.0 / (p.k3 + 1.0)
                s = idf * tfw * userw
            elif model.name == INDRI:
                p = model.indri
                mle = ctf / self.sum_doclen[fld]
                dl = self.doclen[fld].get(d, 0)
                s = (1 - p.lam) * ((tf + p.mu * mle) / (dl + p.mu)) + p.lam * mle
            else:
                raise ValueError(model.name)
            out[d] = f32(s)
        return out

    def _default_score(self, node, model: ModelConfig, docid: int) -> float:
        """getDefaultScore (QryopSlScore.java:178-195): tf = 0, raw double."""
        if isinstance(node, QOp) and node.name in ("and",):
            k = len(node.children)
            prod = 1.0
            for c in node.children:
                prod *= self._default_score(c, model, docid)
            return prod ** (1.0 / k)
        if isinstance(node, QOp) and node.name == "wand":
            W = sum(node.weights)
            s = 1.0
            for c, w in zip(node.children, node.weights):
                s *= self._default_score(c, model, docid) ** (w / W)
            return s
        if isinstance(node, QOp) and node.name == "wsum":
            W = sum(node.weights)
            return sum(
                self._default_score(c, model, docid) * (w / W)
                for c, w in zip(node.children, node.weights)
            )
        # leaf (possibly composite Il) — needs its ctf and field
        lst, fld = self.eval_il(node)
        ctf = sum(tf for tf, _ in lst.values())
        p = model.indri
        mle = ctf / self.sum_doclen[fld]
        dl = self.doclen[fld].get(docid, 0)
        return (1 - p.lam) * (p.mu * mle) / (dl + p.mu) + p.lam * mle

    def _child_score_map(self, node, model) -> dict[int, float]:
        if isinstance(node, QTerm) or (
            isinstance(node, QOp) and node.name in ("syn", "near", "window", "score")
        ):
            inner = node.children[0] if isinstance(node, QOp) and node.name == "score" else node
            return self._term_scores(inner, model)
        return self.eval_sl(node, model)

    def eval_sl(self, node, model: ModelConfig) -> dict[int, float]:
        if isinstance(node, QTerm):
            return self._term_scores(node, model)
        assert isinstance(node, QOp)
        name = node.name
        if name in ("syn", "near", "window", "score"):
            return self._child_score_map(node, model)
        kid_scores = [self._child_score_map(c, model) for c in node.children]
        if name == "and" and model.name in (UNRANKED_BOOLEAN, RANKED_BOOLEAN):
            common = set(kid_scores[0])
            for ks in kid_scores[1:]:
                common &= set(ks)
            if model.name == UNRANKED_BOOLEAN:
                return {d: 1.0 for d in common}
            return {d: min(ks[d] for ks in kid_scores) for d in common}
        if name == "or":
            out = {}
            for ks in kid_scores:
                for d, s in ks.items():
                    out[d] = max(out.get(d, -math.inf), s)
            return out
        if name == "sum":
            out = {}
            for ks in kid_scores:
                for d, s in ks.items():
                    out[d] = out.get(d, 0.0) + s
            return out
        # Indri union-with-defaults family
        union: set[int] = set()
        for ks in kid_scores:
            union |= set(ks)
        out = {}
        if name == "and":
            k = len(node.children)
            for d in union:
                prod = 1.0
                for c, ks in zip(node.children, kid_scores):
                    prod *= ks.get(d, self._default_score(c, model, d))
                out[d] = prod ** (1.0 / k)
            return out
        if name == "wand":
            W = sum(node.weights)
            for d in union:
                s = 1.0
                for c, ks, w in zip(node.children, kid_scores, node.weights):
                    s *= ks.get(d, self._default_score(c, model, d)) ** (w / W)
                out[d] = s
            return out
        if name == "wsum":
            W = sum(node.weights)
            for d in union:
                s = 0.0
                for c, ks, w in zip(node.children, kid_scores, node.weights):
                    s += ks.get(d, self._default_score(c, model, d)) * (w / W)
                out[d] = s
            return out
        raise ValueError(name)

    # ---- end-to-end ----
    def search(self, query: str, model: ModelConfig, k: int = 100):
        ast = parse_query(query, model.name, self.tok)
        scores = self.eval_sl(ast, model)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], self.ext[kv[0]]))
        return [
            (i + 1, d, self.ext[d], s) for i, (d, s) in enumerate(ranked[:k])
        ]


# ---- positional walks, re-derived from the Java independently of ops.py ----


def _near_positions(plists: list[list[int]], dist: int) -> list[int]:
    """QryopIlNear.java:99-135: for each arg0 position find a strictly
    increasing chain with gaps <= dist; per-arg cursors persist across arg0
    positions; a full match consumes one position from every arg; if any arg's
    list exhausts while scanning, the whole document is done."""
    k = len(plists)
    cursors = [0] * k
    out = []
    i0 = 0
    while i0 < len(plists[0]):
        cursors[0] = i0
        prev = plists[0][i0]
        ok = True
        for a in range(1, k):
            lst = plists[a]
            while cursors[a] < len(lst) and lst[cursors[a]] <= prev:
                cursors[a] += 1
            if cursors[a] >= len(lst):
                return out  # exhausted -> abort doc
            if lst[cursors[a]] - prev > dist:
                ok = False
                break
            prev = lst[cursors[a]]
        if ok:
            out.append(plists[0][i0])
            for a in range(1, k):
                cursors[a] += 1
            i0 += 1
        else:
            i0 += 1
    return out


def _window_positions(plists: list[list[int]], dist: int) -> list[int]:
    """QryopIlWindow.java:107-149: while all cursors valid, if
    max-min+1 <= dist emit arg0's position and advance all, else advance the
    min cursor."""
    k = len(plists)
    cur = [0] * k
    out = []
    while all(cur[i] < len(plists[i]) for i in range(k)):
        vals = [plists[i][cur[i]] for i in range(k)]
        mn, mx = min(vals), max(vals)
        if mx - mn + 1 <= dist:
            out.append(plists[0][cur[0]])
            for i in range(k):
                cur[i] += 1
        else:
            cur[vals.index(mn)] += 1
    return out
