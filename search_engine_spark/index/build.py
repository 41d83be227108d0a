"""Inverted-index build pipeline (the piece the reference outsources to Lucene).

The reference only READS a prebuilt Lucene index (hw1/QryEval/ReadMe.txt:
"Given a parameter file which specifies the index path"); its data model is
documented in SURVEY.md §1. We build the equivalent tables with pure
DataFrame ops so Catalyst pipelines tokenize -> explode -> aggregate with
map-side partial aggregation and AQE-sized shuffles:

- doc_ids      docid, ext_docid (+ passthrough id columns)     [dimension]
- doc_terms    docid, field, term, tf, positions               [forward index
               == Lucene TermVector, hw5/QryEval/TermVector.java:19-89]
- doc_stats    docid, field, doclen                            [DocLengthStore,
               hw5/QryEval/DocLengthStore.java:24-40]
- postings     term, field, docid, tf, positions, df, ctf      [InvList rows,
               hw5/QryEval/InvList.java:17-46 — docid-ascending per (term,field);
               df/ctf denormalized onto each row so a term scan needs no join]
- term_stats   term, field, df, ctf                            [InvList.java:102-103]
- corpus_stats field, n_docs, sum_doclen, avgdl (+ N = total docs) [QryopSlScore
               .java:118,129-130,156 pulls these ad-hoc from the Lucene reader]

Positions are 0-based indexes into the post-stopword token sequence; doclen
counts post-stopword tokens (see tokenize.py docstring).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark.tokenize import Tokenizer, WHITESPACE_TOKENIZER


@dataclass
class CorpusStats:
    """Driver-side broadcast of the tiny per-field aggregates."""

    n_docs: int  # numDocs() analog — total docs in the index
    by_field: dict  # field -> {"n_docs": int, "sum_doclen": int, "avgdl": float}

    def avgdl(self, fld: str) -> float:
        return self.by_field[fld]["avgdl"]

    def sum_doclen(self, fld: str) -> int:
        return self.by_field[fld]["sum_doclen"]


@dataclass
class IndexTables:
    """The queryable index: a handful of DataFrames + broadcast scalars."""

    doc_ids: DataFrame      # docid, ext_docid
    doc_terms: DataFrame    # docid, field, term, tf, positions (forward index)
    doc_stats: DataFrame    # docid, field, doclen
    postings: DataFrame     # term, field, docid, tf, positions, df, ctf
    term_stats: DataFrame   # term, field, df, ctf
    corpus: CorpusStats
    fields: tuple
    # analyzer the index was built with (None = unrecorded/legacy): Engine
    # validates its query tokenizer against this — the §1.4 invariant
    tokenizer_name: str | None = None

    def term_postings(self, term: str, fld: str) -> DataFrame:
        """TERM scan (QryopIlTerm.java:56-60): one term's posting list.

        An equality predicate on (term, field) — pushed down to the parquet
        scan / pruned to one bucket when the postings table is persisted
        partitioned by term bucket.
        """
        return self.postings.where(
            (F.col("term") == term) & (F.col("field") == fld)
        )

    def doc_terms_for(
        self, docids, fld: str, with_positions: bool = False
    ) -> DataFrame:
        """Forward-index slice (TermVector analog, hw5/QryEval/TermVector
        .java:19-89): (docid, field, term, tf[, positions]) for the given
        docs. Backed by the materialized doc_terms here; PackedIndex
        overrides with a block-pruned decode of the packed postings."""
        if self.doc_terms is None:
            raise ValueError("index has no forward index (doc_terms)")
        cols = ["docid", "field", "term", "tf"]
        if with_positions:
            cols.append("positions")
        return self.doc_terms.where(
            (F.col("field") == fld) & F.col("docid").isin([int(d) for d in docids])
        ).select(*cols)

    def postings_for(
        self, pairs, with_positions: bool = False, block_filter=None
    ) -> DataFrame:
        """Multi-(term, field) scan — the shape the flat fast paths consume:
        term, field, docid, tf, doclen, df, ctf [, positions]. PackedIndex
        overrides this with a bucket-pruned varint-block decode."""
        from functools import reduce

        cond = reduce(
            lambda a, b: a | b,
            [(F.col("term") == t) & (F.col("field") == f) for t, f in pairs],
        )
        cols = ["term", "field", "docid", "tf", "doclen", "df", "ctf"]
        if with_positions:
            cols.append("positions")
        return self.postings.where(cond).select(*cols)


def tokenize_fields(
    docs: DataFrame, fields: dict[str, str], tokenizer: Tokenizer,
    key: str = "docid",
) -> DataFrame:
    """documents -> (<key>, field, pos, term), one row per token occurrence.

    `fields` maps index-field name -> source column (e.g. {"body": "content"}).
    Tokenization is a JVM split/lower/filter expression; posexplode assigns
    0-based positions. No Python in the loop. ``key`` selects the document
    identifier column (internal docid by default; the streaming matcher keys
    by ext_docid — arriving docs have no internal id yet).
    """
    per_field = []
    for fld, src in fields.items():
        toks = tokenizer.tokens_col(F.col(src))
        per_field.append(
            # two selects: the token ARRAY is materialized once as a column,
            # then size+explode reference that attribute. Referencing the
            # raw expression twice in one select invites per-output-row
            # recomputation of the split inside the generator (quadratic in
            # doc length — observed as a 20x stall at 2k-token docs).
            docs.select(key, toks.alias("_toks")).select(
                key,
                F.lit(fld).alias("field"),
                # doclen = token count BEFORE the explode: rides every token
                # row for free — no later shuffle/window/join to recover it
                F.size("_toks").cast("long").alias("doclen"),
                F.posexplode("_toks").alias("pos", "term"),
            )
        )
    out = per_field[0]
    for df in per_field[1:]:
        out = out.unionByName(df)
    return out


DOC_TERMS_SCHEMA = "docid long, field string, term string, tf int, positions array<int>, doclen long"


def forward_index_pandas(
    docs: DataFrame, fields: dict[str, str], tokenizer: Tokenizer
) -> DataFrame:
    """documents -> doc_terms (docid, field, term, tf, positions, doclen)
    in ONE Arrow-batched mapInPandas pass — tokenize AND the per-(doc, term)
    grouping happen inside the partition, so there is NO explode and NO
    groupBy shuffle at all (each doc's rows are derived locally).

    Why a pandas UDF on the hot path: measured on this corpus shape, the JVM
    `split(lower(content), regex)` costs ~7x more than Python's C regex via
    Arrow (22.8s vs 3.3s for 30k docs / 11.8M tokens at local[8]), and the
    posexplode of 11.8M rows plus its downstream hash-shuffle dominates the
    whole build. The Python twin `tokenizer.tokenize` is bit-identical to
    the JVM expression (tests/test_tokenize.py)."""
    import pandas as pd

    flds = list(fields.items())
    tok = tokenizer

    CHUNK = 256  # docs per yielded frame: bounds worker-resident output rows

    def _flush(out):
        return pd.DataFrame(
            {
                "docid": pd.Series(out["docid"], dtype="int64"),
                "field": pd.Series(out["field"], dtype="object"),
                "term": pd.Series(out["term"], dtype="object"),
                "tf": pd.Series(out["tf"], dtype="int32"),
                "positions": pd.Series(out["positions"], dtype="object"),
                "doclen": pd.Series(out["doclen"], dtype="int64"),
            }
        )

    def gen(batches):
        for pdf in batches:
            out = {
                "docid": [], "field": [], "term": [],
                "tf": [], "positions": [], "doclen": [],
            }
            n_docs = 0
            for row in pdf.itertuples(index=False):
                docid = row.docid
                for fld, src in flds:
                    toks = tok.tokenize(getattr(row, src))
                    if not toks:
                        continue
                    groups: dict[str, list[int]] = {}
                    for pos, t in enumerate(toks):
                        groups.setdefault(t, []).append(pos)
                    n = len(toks)
                    for t, positions in groups.items():
                        out["docid"].append(docid)
                        out["field"].append(fld)
                        out["term"].append(t)
                        out["tf"].append(len(positions))
                        out["positions"].append(positions)
                        out["doclen"].append(n)
                n_docs += 1
                if n_docs >= CHUNK:
                    yield _flush(out)
                    out = {k: [] for k in out}
                    n_docs = 0
            if out["docid"]:
                yield _flush(out)

    cols = ["docid"] + sorted({src for _, src in flds})
    return docs.select(*cols).mapInPandas(gen, DOC_TERMS_SCHEMA)


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    *,
    fields: dict[str, str] | None = None,
    ext_col: str = "ext_docid",
    tokenizer: Tokenizer = WHITESPACE_TOKENIZER,
    cache: bool = True,
) -> IndexTables:
    """Build all index tables from a documents DataFrame.

    `docs` must carry `docid` (long, unique) and `ext_col` (the external id,
    the tie-break key of SURVEY.md §2.6). At cluster scale the caller persists
    the returned tables (see index.persist / index.checkpoint); here they stay
    lazy/cached DataFrames so local tests compose cheaply.
    """
    fields = fields or {"body": "text"}

    doc_ids = docs.select("docid", F.col(ext_col).alias("ext_docid"))

    # Forward index (TermVector analog): computed per-doc inside one Arrow
    # pass — no explode, no shuffle (see forward_index_pandas).
    doc_terms = forward_index_pandas(docs, fields, tokenizer)
    if cache:
        doc_terms = doc_terms.cache()

    # DocLengthStore analog — a projection of the cached forward index.
    doc_stats = doc_terms.select("docid", "field", "doclen").distinct()
    if cache:
        doc_stats = doc_stats.cache()

    term_stats = doc_terms.groupBy("term", "field").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf").cast("long").alias("ctf"),
    )
    if cache:
        term_stats = term_stats.cache()

    # Postings with df/ctf AND doclen denormalized per row: a term scan then
    # needs NO join at query time (BM25 = scan -> codegen'd expression -> agg).
    # df/ctf come from a window over the (term,field) group — same shuffle key
    # as the aggregation; doclen already rides on the doc_terms row.
    from pyspark.sql import Window as W

    w = W.partitionBy("term", "field")
    postings = doc_terms.select(
        "term",
        "field",
        "docid",
        "tf",
        "positions",
        "doclen",
        F.count("*").over(w).cast("long").alias("df"),
        F.sum("tf").over(w).cast("long").alias("ctf"),
    )

    # Tiny broadcast aggregates (one row per field + the doc count).
    n_docs = docs.count()
    rows = (
        doc_stats.groupBy("field")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("doclen").cast("long").alias("sum_doclen"),
        )
        .collect()
    )
    by_field = {
        r["field"]: {
            "n_docs": r["n_docs"],
            "sum_doclen": r["sum_doclen"],
            "avgdl": r["sum_doclen"] / r["n_docs"] if r["n_docs"] else 0.0,
        }
        for r in rows
    }
    corpus = CorpusStats(n_docs=n_docs, by_field=by_field)

    return IndexTables(
        doc_ids=doc_ids,
        doc_terms=doc_terms,
        doc_stats=doc_stats,
        postings=postings,
        term_stats=term_stats,
        corpus=corpus,
        fields=tuple(fields),
        tokenizer_name=tokenizer.name,
    )
