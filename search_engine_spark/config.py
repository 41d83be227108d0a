"""Retrieval-model parameters.

Mirrors the reference's parameter-file surface (hw5/QryEval/QryEval.java:116-204:
model selection + range validation) as plain dataclasses. Defaults are the
reference's reported defaults (hw3 report §1): BM25 k1=1.2 b=0.75 k3=0;
Indri mu=2500 lambda=0.4.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class BM25Params:
    k1: float = 1.2
    b: float = 0.75
    k3: float = 0.0

    def __post_init__(self) -> None:
        if self.k1 < 0:
            raise ValueError("BM25:k1 must be >= 0")
        if not (0.0 <= self.b <= 1.0):
            raise ValueError("BM25:b must be in [0,1]")
        if self.k3 < 0:
            raise ValueError("BM25:k3 must be >= 0")


@dataclass(frozen=True)
class IndriParams:
    mu: float = 2500.0
    lam: float = 0.4  # lambda

    def __post_init__(self) -> None:
        if self.mu < 0:
            raise ValueError("Indri:mu must be >= 0")
        if not (0.0 <= self.lam <= 1.0):
            raise ValueError("Indri:lambda must be in [0,1]")


# Retrieval model names (reference: QryEval.java:116-204)
UNRANKED_BOOLEAN = "UnrankedBoolean"
RANKED_BOOLEAN = "RankedBoolean"
BM25 = "BM25"
INDRI = "Indri"

MODELS = (UNRANKED_BOOLEAN, RANKED_BOOLEAN, BM25, INDRI)


@dataclass(frozen=True)
class ModelConfig:
    """A retrieval model selection plus its parameters."""

    name: str = BM25
    bm25: BM25Params = BM25Params()
    indri: IndriParams = IndriParams()

    def __post_init__(self) -> None:
        if self.name not in MODELS:
            raise ValueError(f"unknown retrieval model {self.name!r}")


TOP_K = 100  # output cutoff (reference: QryEval.java:1272)
