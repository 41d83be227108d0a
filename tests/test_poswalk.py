"""Equivalence: the numpy wavefront walks (engine/poswalk.py) must be
bit-identical to the reference scalar walks (engine/ops.py _near_walk /
_window_walk, themselves golden-tested against QryopIlNear/QryopIlWindow
semantics) on arbitrary batches of sorted position lists."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_spark.engine.ops import _near_walk, _window_walk
from search_engine_spark.engine.poswalk import near_batch, window_batch

pos_list = st.lists(st.integers(0, 60), min_size=1, max_size=25).map(
    lambda xs: sorted(set(xs))
)


def doc_strategy(k: int):
    return st.lists(pos_list, min_size=k, max_size=k)


def batch_strategy():
    return st.integers(2, 4).flatmap(
        lambda k: st.tuples(
            st.just(k),
            st.lists(doc_strategy(k), min_size=0, max_size=12),
            st.integers(1, 12),
        )
    )


def _scalar_batch(walk, docs: list, k: int, distance: int):
    out = {}
    for rank, plists in enumerate(docs):
        res = walk([list(p) for p in plists], distance)
        if res:
            out[rank] = res
    return out


def _vector_batch(batch_fn, docs: list, k: int, distance: int):
    cols = [
        np.array([np.asarray(d[i], dtype=np.int32) for d in docs], dtype=object)
        for i in range(k)
    ]
    ranks, pos_arrays = batch_fn(cols, distance)
    return {int(r): list(map(int, p)) for r, p in zip(ranks, pos_arrays)}


@settings(max_examples=300, deadline=None)
@given(batch_strategy())
def test_near_batch_equivalence(case):
    k, docs, distance = case
    assert _vector_batch(near_batch, docs, k, distance) == _scalar_batch(
        _near_walk, docs, k, distance
    )


@settings(max_examples=300, deadline=None)
@given(batch_strategy())
def test_window_batch_equivalence(case):
    k, docs, distance = case
    assert _vector_batch(window_batch, docs, k, distance) == _scalar_batch(
        _window_walk, docs, k, distance
    )


def test_near_batch_hot_pair_scale():
    """The 100TB hot shape: many docs, two dense stopword-ish terms."""
    rng = np.random.default_rng(7)
    docs = []
    for _ in range(500):
        a = np.unique(rng.integers(0, 4000, size=300)).astype(np.int32)
        b = np.unique(rng.integers(0, 4000, size=300)).astype(np.int32)
        docs.append([a, b])
    assert _vector_batch(near_batch, docs, 2, 3) == _scalar_batch(
        _near_walk, docs, 2, 3
    )
    assert _vector_batch(window_batch, docs, 2, 5) == _scalar_batch(
        _window_walk, docs, 2, 5
    )
