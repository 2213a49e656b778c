"""VectorEngine: the reference's LSM write path (``engine.h``), re-expressed
as immutable Parquet + Structured Streaming.

Reference → Spark mapping (SURVEY.md §2.6, §3.2):
  * active/immutable write buffers (``engine.h:182-195``) → an *unindexed
    delta directory* of appended parquet files; a micro-batch commit is the
    buffer rotation (atomic at file granularity — no torn reads, unlike
    ``write_buffer.h:46-49``);
  * background flush into HNSW (``engine.h:147-176``) → the **compaction
    job**: assign centroids with the saved coarse quantizer (no re-fit),
    rewrite only affected partitions (dynamic partition overwrite);
  * merged search (``engine.h:100-144``) → union(partition-pruned ANN over
    indexed, exact scan over delta) + global top-k;
  * EBR/RCU/snapshots (``ebr_manager.h``) → nothing: immutable files give
    snapshot isolation for free.

Semantics deliberately *stronger* than the reference (divergences documented
in SURVEY.md §2.3 Q4): duplicate ids are upserted — a delta row shadows the
indexed row with the same id (the reference can return duplicate ids and
has a mid-flush visibility gap); delta rows stay visible until the
compaction commit.
"""

from __future__ import annotations

import glob
import os
import shutil
import uuid

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_search_engine_spark.operators.ivf import IVFIndex
from vector_search_engine_spark.operators.knn import _finalize_topk, knn_exact


class VectorEngine:
    def __init__(self, spark: SparkSession, root_dir: str):
        self.spark = spark
        self.root_dir = root_dir
        self.index = IVFIndex(spark, os.path.join(root_dir, "index"))
        self.delta_dir = os.path.join(root_dir, "delta")
        os.makedirs(self.delta_dir, exist_ok=True)

    # -- lifecycle -----------------------------------------------------------

    @classmethod
    def create(
        cls,
        vectors: DataFrame,
        root_dir: str,
        n_centroids: int | None = None,
        **build_kw,
    ) -> "VectorEngine":
        """Bulk-load phase (reference ``server.cpp:72-112``): batch index
        build, then the engine serves merged searches while absorbing
        streaming inserts."""
        spark = vectors.sparkSession
        os.makedirs(root_dir, exist_ok=True)
        IVFIndex.build(
            vectors, os.path.join(root_dir, "index"), n_centroids=n_centroids, **build_kw
        )
        return cls(spark, root_dir)

    # -- write path ----------------------------------------------------------

    def _next_seq(self) -> int:
        seqs = [
            int(os.path.basename(p).split("=")[1])
            for p in glob.glob(os.path.join(self.delta_dir, "_seq=*"))
        ]
        return (max(seqs) + 1) if seqs else 0

    def insert(self, rows: DataFrame, seq: int | None = None) -> None:
        """Append a batch to the unindexed delta (the foreachBatch body).
        Wait-free analog: appends never touch the indexed table.  ``_seq``
        (monotone batch number) makes 'latest version of an id' well-defined
        — the reference has no such notion and returns duplicates."""
        seq = self._next_seq() if seq is None else seq
        cols = [self.index.meta["id_col"], self.index.meta["vec_col"]]
        rows.select(*cols).withColumn("_seq", F.lit(seq).cast("long")).write.mode(
            "append"
        ).partitionBy("_seq").parquet(self.delta_dir)

    def ingest_stream(self, stream_df: DataFrame, checkpoint: str | None = None):
        """Structured Streaming ingest: micro-batch append into the delta
        (reference Insert RPC path, ``server.cpp:45-66`` + W1/W2 buffering).
        Returns the StreamingQuery (caller awaits/validates)."""
        checkpoint = checkpoint or os.path.join(self.root_dir, "_checkpoint")

        def write_batch(bdf: DataFrame, batch_id: int) -> None:
            self.insert(bdf)

        return (
            stream_df.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )

    def delta(self) -> DataFrame:
        files = glob.glob(
            os.path.join(self.delta_dir, "**", "*.parquet"), recursive=True
        )
        id_col = self.index.meta["id_col"]
        vec_col = self.index.meta["vec_col"]
        if not files:
            return self.spark.createDataFrame(
                [], f"{id_col} long, {vec_col} array<float>, _seq long"
            )
        return self.spark.read.parquet(self.delta_dir).select(
            id_col, vec_col, "_seq"
        )

    def delta_latest(self) -> DataFrame:
        """One row per id: the highest-_seq version (upsert semantics)."""
        from pyspark.sql import Window

        id_col = self.index.meta["id_col"]
        vec_col = self.index.meta["vec_col"]
        w = Window.partitionBy(id_col).orderBy(F.col("_seq").desc())
        return (
            self.delta()
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(id_col, vec_col)
        )

    # -- read path -----------------------------------------------------------

    def search(
        self, queries: DataFrame, k: int = 10, nprobe: int = 4
    ) -> DataFrame:
        """Merged search (reference Q4): ANN over the indexed table with
        shadowed ids excluded + exact scan of the delta, one global top-k."""
        id_col = self.index.meta["id_col"]
        vec_col = self.index.meta["vec_col"]
        delta_latest = self.delta_latest()
        # shadowed ids exclude via anti-join — the delta can be arbitrarily
        # large under sustained ingest; ids never visit the driver
        indexed_part = self.index.search(
            queries, k=k, nprobe=nprobe, exclude_ids=delta_latest.select(id_col)
        )
        delta_part = knn_exact(
            delta_latest, queries, k=k, id_col=id_col, vec_col=vec_col
        )
        merged = indexed_part.select("qid", "neighbor_id", F.col("dist_sq")).unionByName(
            delta_part.select("qid", "neighbor_id", F.col("dist_sq"))
        )
        # ranks were per-source; recompute the global top-k on raw dists
        return _finalize_topk(
            merged.select("qid", "neighbor_id", F.col("dist_sq").alias("dist")),
            k,
            "l2_sq",
        )

    # -- compaction (reference W4 background flush) --------------------------

    def assign_centroids(self, rows: DataFrame) -> DataFrame:
        """Nearest-centroid assignment with the SAVED quantizer (assign-only;
        model refresh is a separate offline decision — SURVEY.md §7)."""
        id_col = self.index.meta["id_col"]
        vec_col = self.index.meta["vec_col"]
        C = self.index.centroids
        cids = self.index.centroid_ids
        bc = self.spark.sparkContext.broadcast((cids, C))

        def assign(batches):
            import pandas as pd

            cids_, C_ = bc.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                D = (
                    (V * V).sum(axis=1)[:, None]
                    - 2.0 * (V @ C_.T)
                    + (C_ * C_).sum(axis=1)[None, :]
                )
                pdf = pdf.copy()
                a = np.argmin(D, axis=1)
                pdf["centroid_id"] = cids_[a].astype("int32")
                # index layout v2 carries the assignment distance (cell
                # radii for exact radius_search pruning)
                pdf["dist_to_centroid"] = D[np.arange(len(a)), a]
                yield pdf

        schema = (
            f"{id_col} long, {vec_col} array<float>, "
            "centroid_id int, dist_to_centroid double"
        )
        return rows.select(id_col, vec_col).mapInPandas(assign, schema=schema)

    def compact(self) -> int:
        """Fold the delta into the partitioned indexed table: rewrite only
        partitions that receive new rows or contain shadowed ids (dynamic
        partition overwrite), then clear the delta.  Search results before
        and after are identical (tested)."""
        id_col = self.index.meta["id_col"]
        vec_col = self.index.meta["vec_col"]
        delta_latest = self.delta_latest()
        n_delta = delta_latest.count()
        if n_delta == 0:
            return 0
        assigned = self.assign_centroids(delta_latest).cache()
        indexed = self.spark.read.parquet(self.index_vectors_dir())
        delta_id_df = assigned.select(id_col)
        # affected-cell list is bounded by n_centroids — safe to collect;
        # the id sets flow through semi/anti joins, never the driver
        affected = sorted(
            r[0]
            for r in assigned.select("centroid_id")
            .union(
                indexed.join(delta_id_df, id_col, "left_semi").select("centroid_id")
            )
            .distinct()
            .collect()
        )
        survivors = (
            indexed.filter(F.col("centroid_id").isin(affected))
            .join(delta_id_df, id_col, "left_anti")
            .select(id_col, vec_col, "dist_to_centroid", "centroid_id")
        )
        new_rows = assigned.filter(F.col("centroid_id").isin(affected))
        rewritten = survivors.unionByName(
            new_rows.select(id_col, vec_col, "dist_to_centroid", "centroid_id")
        ).sortWithinPartitions("centroid_id", "dist_to_centroid")
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        rewritten.write.mode("overwrite").partitionBy("centroid_id").parquet(
            self.index_vectors_dir()
        )
        # clear delta only after the commit (move-aside, then drop)
        tomb = self.delta_dir + f".compacted-{uuid.uuid4().hex[:8]}"
        os.rename(self.delta_dir, tomb)
        os.makedirs(self.delta_dir, exist_ok=True)
        shutil.rmtree(tomb, ignore_errors=True)
        ckpt = os.path.join(self.root_dir, "_checkpoint")
        shutil.rmtree(ckpt, ignore_errors=True)
        return n_delta

    def maybe_compact(self, max_delta_fraction: float = 0.25) -> int:
        """Compaction trigger policy (reference W3 soft/hard limits,
        ``engine.h:76-86``): fold the delta when it exceeds
        ``max_delta_fraction`` of the indexed row count.  Returns rows
        compacted (0 = below threshold).  Call from the ingest cadence
        (e.g. every foreachBatch) — cheap when below threshold."""
        n_delta = self.delta().count()
        if n_delta == 0:
            return 0
        n_indexed = max(1, int(self.index.meta.get("n_vectors", 1)))
        if n_delta / n_indexed < max_delta_fraction:
            return 0
        return self.compact()

    def index_vectors_dir(self) -> str:
        return os.path.join(self.root_dir, "index", "vectors")
