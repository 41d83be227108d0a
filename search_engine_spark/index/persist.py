"""Persistent inverted-index build: bucketed, salted, checkpointed, resumable.

The production-scale pipeline (SURVEY.md §4.2, north_rule). Layout under
``out_dir``:

    doc_ids/            parquet  docid, ext_docid (+ natural-key columns)
    doc_stats/          parquet  docid, field, doclen
    doc_terms/          parquet  partitioned by bucket=pmod(xxhash64(term), B)
                                 (the forward index, feeds per-bucket builds)
    term_stats/         parquet  term, field, df, ctf, bucket
    packed/             parquet  partitioned by bucket: one row per posting
                                 BLOCK — term, field, salt, block_id, n,
                                 min_docid, max_docid, max_tf, min_doclen
                                 (block-max metadata, plain columns) +
                                 docids/tfs/doclens/positions (varint binary).
                                 Column pruning means a metadata-only read
                                 never touches the binary columns.
    corpus_stats.json   tiny per-field aggregates (N, sum_doclen, avgdl)
    manifest.json       lineage + per-stage/per-bucket completion + counters

Design points for 100 TB / 1000 executors:

- **One tokenize pass.** ``doc_terms`` is written once, hash-partitioned by
  term bucket; every per-bucket postings build reads exactly one partition
  (partition pruning on ``bucket``).
- **Skew (stopword-grade terms).** groupBy(term) would put all of ``def``'s
  postings in one task. Terms with df > ``salt_threshold`` are salted by
  docid RANGE: ``salt = floor(docid · S / (max_docid+1))`` — contiguous
  ranges, so blocks from different salts never overlap in docid space and
  the global docid-ascending invariant survives concatenation in salt order
  (no merge pass needed, unlike modulo salting).
- **Resumable.** Each bucket's packed output is an independent, idempotent
  overwrite; ``manifest.json`` records completed buckets + counters (docs
  tokenized, postings emitted, blocks written). A killed build re-run with
  ``resume=True`` skips completed stages/buckets — the resume test asserts
  byte-identical results.
- **Counters** are Spark accumulators aggregated per stage and persisted in
  the manifest (lineage: input fingerprint = count + sha256 of sorted ext
  ids, config echo).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass, field as dc_field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from search_engine_spark.index.build import CorpusStats, IndexTables
from search_engine_spark.index.codec import BLOCK_SIZE, encode_blocks
from search_engine_spark.tokenize import CODE_TOKENIZER, Tokenizer


@dataclass
class BuildConfig:
    out_dir: str
    n_buckets: int = 16
    block_size: int = BLOCK_SIZE
    salt_threshold: int = 100_000  # df above this -> salted build
    n_salts: int = 8
    fields: dict = dc_field(default_factory=lambda: {"body": "content"})
    tokenizer: Tokenizer = CODE_TOKENIZER


PACKED_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("field", T.StringType()),
        T.StructField("salt", T.IntegerType()),
        T.StructField("block_id", T.IntegerType()),
        T.StructField("n", T.IntegerType()),
        T.StructField("min_docid", T.LongType()),
        T.StructField("max_docid", T.LongType()),
        T.StructField("max_tf", T.IntegerType()),
        T.StructField("min_doclen", T.LongType()),
        T.StructField("docids", T.BinaryType()),
        T.StructField("tfs", T.BinaryType()),
        T.StructField("doclens", T.BinaryType()),
        T.StructField("positions", T.BinaryType()),
    ]
)

META_COLS = [
    "term", "field", "salt", "block_id", "n",
    "min_docid", "max_docid", "max_tf", "min_doclen",
]


# --------------------------------------------------------------------------
# manifest
# --------------------------------------------------------------------------


class Manifest:
    def __init__(self, path: str):
        self.path = path
        self.data = {"stages": {}, "buckets": {}, "counters": {}, "lineage": {}}
        if os.path.exists(path):
            with open(path) as f:
                self.data = json.load(f)

    def stage_done(self, name: str) -> bool:
        return self.data["stages"].get(name, {}).get("done", False)

    def mark_stage(self, name: str, **counters) -> None:
        self.data["stages"][name] = {"done": True, "ts": time.time(), **counters}
        for k, v in counters.items():
            if isinstance(v, (int, float)):
                self.data["counters"][k] = self.data["counters"].get(k, 0) + v
        self._flush()

    def bucket_done(self, b: int) -> bool:
        return self.data["buckets"].get(str(b), {}).get("done", False)

    def mark_bucket(self, b: int, **counters) -> None:
        self.data["buckets"][str(b)] = {"done": True, "ts": time.time(), **counters}
        for k, v in counters.items():
            self.data["counters"][k] = self.data["counters"].get(k, 0) + v
        self._flush()

    def set_lineage(self, **kv) -> None:
        self.data["lineage"].update(kv)
        self._flush()

    def _flush(self) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.data, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)


# --------------------------------------------------------------------------
# build
# --------------------------------------------------------------------------


def _bucket_col(term_col, n_buckets: int):
    return F.pmod(F.xxhash64(term_col), F.lit(n_buckets)).cast("int")


def build_persistent_index(
    spark: SparkSession,
    docs: DataFrame,
    cfg: BuildConfig,
    resume: bool = True,
    fail_after_bucket: int | None = None,
) -> dict:
    """Build (or resume) the on-disk index. ``docs`` must carry docid,
    ext_docid and the source columns named in cfg.fields.
    ``fail_after_bucket`` injects a crash after that bucket commits — used by
    the resume test only. Returns the manifest counters."""
    out = cfg.out_dir
    os.makedirs(out, exist_ok=True)
    man = Manifest(os.path.join(out, "manifest.json"))
    if not resume:
        man.data = {"stages": {}, "buckets": {}, "counters": {}, "lineage": {}}

    docs = docs.cache()

    # ---- stage: lineage fingerprint -------------------------------------
    if not man.stage_done("lineage"):
        t_stage = time.time()
        n_docs = docs.count()
        # order-independent xor of per-row hashes: fully partial-aggregated,
        # no single-task global sort (which was a serial tail at scale)
        fp_row = docs.agg(
            F.bit_xor(F.xxhash64("ext_docid")).alias("x"),
            F.bit_xor(F.xxhash64(F.sha2(F.col("content"), 256))).alias("c")
            if "content" in docs.columns
            else F.lit(0).alias("c"),
        ).first()
        fp = f"{fp_row['x']:x}:{fp_row['c']:x}"
        man.set_lineage(
            n_docs=n_docs,
            input_fingerprint=fp,
            n_buckets=cfg.n_buckets,
            block_size=cfg.block_size,
            salt_threshold=cfg.salt_threshold,
            n_salts=cfg.n_salts,
            fields=sorted(cfg.fields),
            tokenizer=cfg.tokenizer.name,
        )
        man.mark_stage(
            "lineage", docs_seen=n_docs,
            lineage_sec=round(time.time() - t_stage, 2),
        )

    # ---- stage: doc_ids -------------------------------------------------
    if not man.stage_done("doc_ids"):
        docs.select("docid", "ext_docid").write.mode("overwrite").parquet(
            f"{out}/doc_ids"
        )
        man.mark_stage("doc_ids")

    # ---- stage: forward index (doc_terms, bucketed) ---------------------
    if not man.stage_done("doc_terms"):
        from search_engine_spark.index.build import forward_index_pandas

        t_stage = time.time()
        # one Arrow pass builds the grouped forward index per doc (no
        # explode, no groupBy shuffle — see forward_index_pandas); the only
        # shuffle is the bucket repartition feeding the partitioned write
        doc_terms = forward_index_pandas(
            docs, cfg.fields, cfg.tokenizer
        ).withColumn("bucket", _bucket_col(F.col("term"), cfg.n_buckets))
        # NO repartition: every map task writes its rows into per-bucket
        # files directly (tasks x buckets files). A pre-write shuffle by
        # bucket would cap writer parallelism at n_buckets and stall the
        # pipeline behind one exchange; file count is compacted by the
        # per-bucket packed build anyway.
        (
            doc_terms.write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(f"{out}/doc_terms")
        )
        man.mark_stage(
            "doc_terms",
            docs_tokenized=docs.count(),
            doc_terms_sec=round(time.time() - t_stage, 2),
        )

    doc_terms = spark.read.parquet(f"{out}/doc_terms")

    # ---- stage: doc_stats + term_stats + corpus_stats -------------------
    if not man.stage_done("stats"):
        t_stage = time.time()
        doc_stats = doc_terms.select("docid", "field", "doclen").distinct()
        doc_stats.write.mode("overwrite").parquet(f"{out}/doc_stats")
        term_stats = doc_terms.groupBy("term", "field").agg(
            F.count("*").cast("long").alias("df"),
            F.sum("tf").cast("long").alias("ctf"),
        ).withColumn("bucket", _bucket_col(F.col("term"), cfg.n_buckets))
        term_stats.write.mode("overwrite").parquet(f"{out}/term_stats")

        rows = (
            spark.read.parquet(f"{out}/doc_stats")
            .groupBy("field")
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
        stats = {"n_docs": man.data["lineage"]["n_docs"], "by_field": by_field}
        with open(f"{out}/corpus_stats.json", "w") as f:
            json.dump(stats, f, indent=1)
        man.mark_stage(
            "stats", n_terms=term_stats.count(),
            stats_sec=round(time.time() - t_stage, 2),
        )

    # max docid for range salting (from lineage — docids are dense 1..N)
    max_docid = int(man.data["lineage"]["n_docs"])
    n_salts = cfg.n_salts
    threshold = cfg.salt_threshold
    block_size = cfg.block_size

    # ---- per-bucket packed postings build -------------------------------
    tstats = spark.read.parquet(f"{out}/term_stats")

    def encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
        """One (term, field, salt) group -> packed block rows. Input rows:
        docid, tf, positions, doclen — sorted here; numpy-vectorized codec."""
        pdf = pdf.sort_values("docid")
        term = pdf["term"].iloc[0]
        fld = pdf["field"].iloc[0]
        salt = int(pdf["salt"].iloc[0])
        blocks = encode_blocks(
            pdf["docid"].to_numpy(np.int64),
            pdf["tf"].to_numpy(np.int64),
            pdf["doclen"].to_numpy(np.int64),
            list(pdf["positions"]),
            block_size=block_size,
        )
        return pd.DataFrame(
            [
                {
                    "term": term, "field": fld, "salt": salt,
                    "block_id": b["block_id"], "n": b["n"],
                    "min_docid": b["min_docid"], "max_docid": b["max_docid"],
                    "max_tf": b["max_tf"], "min_doclen": b["min_doclen"],
                    "docids": b["docids"], "tfs": b["tfs"],
                    "doclens": b["doclens"], "positions": b["positions"],
                }
                for b in blocks
            ],
            columns=[f.name for f in PACKED_SCHEMA.fields],
        )

    import threading
    from concurrent.futures import ThreadPoolExecutor

    man_lock = threading.Lock()
    blocks_written = 0
    failed_at: list[int] = []

    def build_bucket(b: int) -> int:
        """One bucket: partition-pruned doc_terms read (doclen already on
        the row — no join), broadcast heavy-term flags, salted
        applyInPandas encode, idempotent overwrite, manifest commit."""
        part = spark.read.parquet(f"{out}/doc_terms/bucket={b}")
        heavy = tstats.where(
            (F.col("bucket") == b) & (F.col("df") > threshold)
        ).select("term", "field", F.lit(True).alias("_heavy"))
        joined = part.join(F.broadcast(heavy), ["term", "field"], "left").withColumn(
            "salt",
            F.when(
                F.col("_heavy").isNotNull(),
                (F.col("docid") * n_salts / (max_docid + 1)).cast("int"),
            ).otherwise(F.lit(0)),
        )
        packed = joined.select(
            "term", "field", "salt", "docid", "tf", "positions", "doclen"
        ).groupBy("term", "field", "salt").applyInPandas(
            encode_group, PACKED_SCHEMA
        )
        packed.write.mode("overwrite").parquet(f"{out}/packed/bucket={b}")
        return spark.read.parquet(f"{out}/packed/bucket={b}").count()

    t_buckets = time.time()

    # buckets build concurrently (Spark schedules the jobs side by side,
    # filling executor slots a single bucket's tail tasks would leave idle);
    # each commits independently -> resume granularity is per bucket.
    todo = [b for b in range(cfg.n_buckets) if not man.bucket_done(b)]
    if fail_after_bucket is not None:
        # deterministic sequential mode for the failure-injection test
        for b in todo:
            nb = build_bucket(b)
            blocks_written += nb
            man.mark_bucket(b, blocks_written=nb)
            if b >= fail_after_bucket:
                raise RuntimeError(f"injected failure after bucket {b}")
    elif todo:
        with ThreadPoolExecutor(max_workers=min(8, len(todo))) as pool:
            for b, nb in zip(todo, pool.map(build_bucket, todo)):
                with man_lock:
                    blocks_written += nb
                    man.mark_bucket(b, blocks_written=nb)

    man.mark_stage(
        "packed", total_blocks=blocks_written,
        buckets_sec=round(time.time() - t_buckets, 2),
    )
    return dict(man.data["counters"], **man.data["lineage"])


# --------------------------------------------------------------------------
# read side
# --------------------------------------------------------------------------


class PackedIndex(IndexTables):
    """IndexTables over the persisted layout: term scans decode packed
    varint blocks (bucket-pruned parquet read + Arrow-batched numpy decode);
    block-max metadata reads touch only the small plain columns."""

    def __init__(self, spark: SparkSession, out_dir: str, cfg: BuildConfig | None = None):
        self.spark = spark
        self.dir = out_dir
        with open(f"{out_dir}/corpus_stats.json") as f:
            st = json.load(f)
        man = Manifest(os.path.join(out_dir, "manifest.json"))
        self.n_buckets = int(man.data["lineage"]["n_buckets"])
        packed = spark.read.parquet(f"{out_dir}/packed")
        doc_terms = spark.read.parquet(f"{out_dir}/doc_terms")
        super().__init__(
            doc_ids=spark.read.parquet(f"{out_dir}/doc_ids"),
            doc_terms=doc_terms,
            doc_stats=spark.read.parquet(f"{out_dir}/doc_stats"),
            postings=None,  # packed — use postings_for / term_postings
            term_stats=spark.read.parquet(f"{out_dir}/term_stats"),
            corpus=CorpusStats(n_docs=st["n_docs"], by_field=st["by_field"]),
            fields=tuple(sorted({f for f in st["by_field"]})),
        )
        self.packed = packed

    # -- metadata-only scan (column-pruned: no binary columns read) --------
    def blocks_meta(self, pairs: list[tuple[str, str]]) -> DataFrame:
        cond = self._pairs_cond(pairs)
        return self.packed.where(cond).select(*META_COLS)

    def _pairs_cond(self, pairs):
        from functools import reduce

        def one(t, f):
            return (
                (F.col("bucket") == _py_bucket(t, self.n_buckets))
                & (F.col("term") == t)
                & (F.col("field") == f)
            )

        return reduce(lambda a, b: a | b, [one(t, f) for t, f in pairs])

    # -- decode scan -------------------------------------------------------
    def postings_for(
        self,
        pairs: list[tuple[str, str]],
        with_positions: bool = False,
        block_filter: DataFrame | None = None,
    ) -> DataFrame:
        """(term, field) pairs -> postings-shaped DataFrame
        (term, field, docid, tf, doclen[, positions], df, ctf).

        The parquet scan is pruned to the terms' buckets; decode is an
        Arrow-batched numpy loop (no per-row Python). ``block_filter``
        (term, field, salt, block_id) restricts to surviving blocks —
        the block-max pruning hook."""
        from search_engine_spark.index.codec import decode_block

        scan_cols = [
            "term", "field", "salt", "block_id", "n",
            "docids", "tfs", "doclens",
        ]
        if with_positions:
            scan_cols.append("positions")
        scan = self.packed.where(self._pairs_cond(pairs)).select(*scan_cols)
        if block_filter is not None:
            scan = scan.join(
                F.broadcast(block_filter), ["term", "field", "salt", "block_id"]
            )

        out_fields = [
            T.StructField("term", T.StringType()),
            T.StructField("field", T.StringType()),
            T.StructField("docid", T.LongType()),
            T.StructField("tf", T.IntegerType()),
            T.StructField("doclen", T.LongType()),
        ]
        if with_positions:
            out_fields.append(T.StructField("positions", T.ArrayType(T.IntegerType())))
        out_schema = T.StructType(out_fields)

        def decode_iter(batches):
            for pdf in batches:
                outs = []
                for row in pdf.itertuples(index=False):
                    blk = {
                        "n": row.n, "docids": row.docids, "tfs": row.tfs,
                        "doclens": row.doclens,
                    }
                    if with_positions:
                        blk["positions"] = row.positions
                        d, t, L, P = decode_block(blk, with_positions=True)
                    else:
                        d, t, L = decode_block(blk)
                    df_ = pd.DataFrame(
                        {
                            "term": row.term, "field": row.field,
                            "docid": d.astype("int64"),
                            "tf": t.astype("int32"),
                            "doclen": L.astype("int64"),
                        }
                    )
                    if with_positions:
                        df_["positions"] = pd.Series(
                            [p.astype("int32") for p in P], dtype="object"
                        )
                    outs.append(df_)
                if outs:
                    yield pd.concat(outs, ignore_index=True)
                else:
                    yield pd.DataFrame(
                        {
                            "term": pd.Series([], dtype="object"),
                            "field": pd.Series([], dtype="object"),
                            "docid": pd.Series([], dtype="int64"),
                            "tf": pd.Series([], dtype="int32"),
                            "doclen": pd.Series([], dtype="int64"),
                            **(
                                {"positions": pd.Series([], dtype="object")}
                                if with_positions
                                else {}
                            ),
                        }
                    )

        decoded = scan.mapInPandas(decode_iter, out_schema)
        # df/ctf ride in via broadcast join with term_stats (tiny per query)
        st = self.term_stats.where(
            self._stats_cond(pairs)
        ).select("term", "field", "df", "ctf")
        return decoded.join(F.broadcast(st), ["term", "field"])

    def _stats_cond(self, pairs):
        from functools import reduce

        return reduce(
            lambda a, b: a | b,
            [(F.col("term") == t) & (F.col("field") == f) for t, f in pairs],
        )

    def term_postings(self, term: str, fld: str) -> DataFrame:
        return self.postings_for([(term, fld)], with_positions=True)


def _py_bucket(term: str, n_buckets: int) -> int:
    """Driver-side xxhash64 bucket — must match F.xxhash64 exactly. Computed
    lazily via a 1-row Spark expression and cached (no reimplementation drift)."""
    key = (term, n_buckets)
    if key not in _BUCKET_CACHE:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        _BUCKET_CACHE[key] = (
            spark.range(1)
            .select(_bucket_col(F.lit(term), n_buckets).alias("b"))
            .first()["b"]
        )
    return _BUCKET_CACHE[key]


_BUCKET_CACHE: dict = {}
