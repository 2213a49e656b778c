"""fvecs/ivecs sources and sinks (reference S1/S2, ``utils.h:11-67``).

The SIFT interchange formats are record streams::

    .fvecs record = int32 dim | dim * float32     (utils.h:11-39)
    .ivecs record = int32 dim | dim * int32       (utils.h:42-67)
    .bvecs record = int32 dim | dim * uint8       (bigann billion-scale
                    corpora; no reference loader — scale extension)

The reference reads them single-threaded on one node into one flat array,
inferring dim from record 0 and validating every record's dim field
(``utils.h:19-25``, ``utils.h:32-34``).  Ids are positional: record ``i``
gets id ``i`` (``server.cpp:88-103`` bulk load).

Spark-first design (100 TB posture):

* **Ranged parallel scan.**  Once dim is known the record size is fixed
  (``4 + 4*dim`` bytes), so a file splits into byte ranges on record
  boundaries with zero coordination — each task seeks to its own offset
  and decodes its slice with one ``np.frombuffer``.  The driver reads only
  4 bytes per file (the first dim header); vectors never pass through it.
  This is the same split strategy Spark's parquet/csv readers use
  (``maxPartitionBytes``-sized splits), applied to a raw binary format.
* **Sharded sink.**  ``write_fvecs`` range-partitions by id and writes one
  shard per partition; shard names sort in id order, so a directory of
  shards is itself a valid positional fvecs dataset.  Readers assign
  global ids by cumulative record offsets across (sorted) shards.
* **Per-record validation.**  Every record's dim field is checked in the
  worker (vectorized), preserving ``utils.h:24`` / ``utils.h:33``
  semantics; a corrupt or truncated file fails loudly, not silently.
"""

from __future__ import annotations

import os
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_SPLIT_BYTES = 64 * 1024 * 1024  # parquet-style split size


def _peek_dim(path: str) -> int:
    with open(path, "rb") as f:
        head = f.read(4)
    if len(head) < 4:
        raise ValueError(f"{path}: too short for an fvecs/ivecs header")
    (dim,) = struct.unpack("<i", head)
    if dim <= 0 or dim > 1_000_000:
        raise ValueError(f"{path}: implausible dim {dim} in first record")
    return dim


def _list_shards(path: str, suffix: str) -> list[str]:
    """A dataset is one file or a directory of shards (sorted by name =
    global id order, mirroring how the sink lays them out)."""
    if os.path.isdir(path):
        shards = sorted(
            os.path.join(path, n)
            for n in os.listdir(path)
            if n.endswith(suffix) and not n.startswith(("_", "."))
        )
        if not shards:
            raise FileNotFoundError(f"no *{suffix} shards under {path}")
        return shards
    return [path]


def _plan_chunks(
    shards: list[str], record_bytes: int, split_bytes: int
) -> tuple[list[tuple[str, int, int, int]], int]:
    """(path, byte_offset, n_records, id_start) per chunk; total records.

    Chunk boundaries always land on record boundaries, so tasks never
    coordinate.  Id assignment is positional across shards (reference
    ``server.cpp:94``: id = row index).
    """
    records_per_chunk = max(1, split_bytes // record_bytes)
    chunks: list[tuple[str, int, int, int]] = []
    id_start = 0
    for path in shards:
        size = os.path.getsize(path)
        if size % record_bytes != 0:
            raise ValueError(
                f"{path}: size {size} not a multiple of record size "
                f"{record_bytes} — truncated file or ragged dims"
            )
        n = size // record_bytes
        off = 0
        while off < n:
            take = min(records_per_chunk, n - off)
            chunks.append((path, off * record_bytes, take, id_start + off))
            off += take
        id_start += n
    return chunks, id_start


def _scan(
    spark: SparkSession,
    path: str,
    *,
    suffix: str,
    np_dtype: str,
    spark_elem: str,
    id_col: str,
    vec_col: str,
    split_bytes: int,
    elem_bytes: int = 4,
) -> DataFrame:
    shards = _list_shards(path, suffix)
    dim = _peek_dim(shards[0])
    record_bytes = 4 + elem_bytes * dim
    chunks, total = _plan_chunks(shards, record_bytes, split_bytes)
    plan = spark.createDataFrame(
        pd.DataFrame(chunks, columns=["path", "byte_offset", "n_records", "id_start"])
    ).repartition(len(chunks))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                with open(row.path, "rb") as f:
                    f.seek(row.byte_offset)
                    raw = f.read(int(row.n_records) * record_bytes)
                if len(raw) != int(row.n_records) * record_bytes:
                    raise IOError(f"{row.path}: short read at {row.byte_offset}")
                # byte-matrix view works for ANY element width (records are
                # not 4-aligned when elem_bytes == 1, so no int32 reshape)
                rec = np.frombuffer(raw, dtype=np.uint8).reshape(-1, record_bytes)
                dims = rec[:, :4].copy().view("<i4").ravel()
                if not (dims == dim).all():
                    bad = int(np.argmax(dims != dim))
                    raise ValueError(
                        f"{row.path}: record {int(row.id_start) + bad} has dim "
                        f"{int(dims[bad])}, expected {dim} (utils.h:24 semantics)"
                    )
                vecs = rec[:, 4:].copy().view(np_dtype)
                ids = int(row.id_start) + np.arange(int(row.n_records), dtype=np.int64)
                yield pd.DataFrame({id_col: ids, vec_col: list(vecs)})

    return plan.mapInPandas(
        decode, schema=f"{id_col} long, {vec_col} array<{spark_elem}>"
    )


def scan_fvecs(
    spark: SparkSession,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    split_bytes: int = DEFAULT_SPLIT_BYTES,
) -> DataFrame:
    """Distributed ``.fvecs`` scan → ``(id long, vector array<float>)``.

    Reference: ``load_fvecs`` (``utils.h:11-39``), single-node; here each
    byte-range split decodes independently.
    """
    return _scan(
        spark,
        path,
        suffix=".fvecs",
        np_dtype="<f4",
        spark_elem="float",
        id_col=id_col,
        vec_col=vec_col,
        split_bytes=split_bytes,
    )


def scan_ivecs(
    spark: SparkSession,
    path: str,
    id_col: str = "qid",
    vec_col: str = "neighbor_ids",
    split_bytes: int = DEFAULT_SPLIT_BYTES,
) -> DataFrame:
    """Distributed ``.ivecs`` scan → ``(id long, ids array<int>)``
    (ground-truth lists; reference ``load_ivecs``, ``utils.h:42-67``)."""
    return _scan(
        spark,
        path,
        suffix=".ivecs",
        np_dtype="<i4",
        spark_elem="int",
        id_col=id_col,
        vec_col=vec_col,
        split_bytes=split_bytes,
    )


def scan_bvecs(
    spark: SparkSession,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    split_bytes: int = DEFAULT_SPLIT_BYTES,
) -> DataFrame:
    """Distributed ``.bvecs`` scan → ``(id long, vector array<int>)``.

    The byte-vector sibling of fvecs (record = int32 dim | dim × uint8)
    — the format of the billion-scale SIFT corpora (bigann).  Elements
    surface as ints 0..255 (Spark has no unsigned byte type)."""
    return _scan(
        spark,
        path,
        suffix=".bvecs",
        np_dtype="u1",
        spark_elem="int",
        id_col=id_col,
        vec_col=vec_col,
        split_bytes=split_bytes,
        elem_bytes=1,
    )


def _write(
    df: DataFrame,
    out_dir: str,
    *,
    suffix: str,
    np_dtype: str,
    id_col: str,
    vec_col: str,
    num_shards: int | None,
) -> DataFrame:
    """Shared sink: range-partition by id, sort within partitions, one
    shard per partition (named so lexicographic order == id order).

    Returns the shard manifest ``(shard, n_records, min_id, max_id)``.
    Positional-id round-trip requires the input ids to be dense 0..N-1 —
    the writer does not renumber (the reference's formats have no id
    field at all; position IS the id).
    """
    os.makedirs(out_dir, exist_ok=True)
    n = num_shards or max(1, df.rdd.getNumPartitions() // 4)
    arranged = (
        df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"))
        .repartitionByRange(n, "_id")
        .sortWithinPartitions("_id")
    )

    def write_shard(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        shard = os.path.join(out_dir, f"part-{pid:05d}{suffix}")
        n_rec, lo, hi = 0, None, None
        with open(shard, "wb") as f:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                vecs = np.stack(pdf["_vec"].to_numpy()).astype(np_dtype)
                dims = np.full((len(vecs), 1), vecs.shape[1], dtype="<i4")
                # byte-level hstack works for any element width
                f.write(
                    np.hstack(
                        [dims.view(np.uint8), vecs.view(np.uint8)]
                    ).tobytes()
                )
                ids = pdf["_id"].to_numpy()
                n_rec += len(vecs)
                lo = int(ids.min()) if lo is None else min(lo, int(ids.min()))
                hi = int(ids.max()) if hi is None else max(hi, int(ids.max()))
        if n_rec == 0:
            os.remove(shard)
            return
        yield pd.DataFrame(
            {"shard": [shard], "n_records": [n_rec], "min_id": [lo], "max_id": [hi]}
        )

    manifest = arranged.mapInPandas(
        write_shard, schema="shard string, n_records long, min_id long, max_id long"
    )
    # mapInPandas is lazy; force the write and return the manifest as data
    rows = manifest.collect()
    return df.sparkSession.createDataFrame(
        rows, "shard string, n_records long, min_id long, max_id long"
    )


def write_fvecs(
    df: DataFrame,
    out_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_shards: int | None = None,
) -> DataFrame:
    """Write ``(id, array<float>)`` as a sharded positional ``.fvecs``
    dataset; returns the shard manifest DataFrame."""
    return _write(
        df,
        out_dir,
        suffix=".fvecs",
        np_dtype="<f4",
        id_col=id_col,
        vec_col=vec_col,
        num_shards=num_shards,
    )


def write_bvecs(
    df: DataFrame,
    out_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_shards: int | None = None,
) -> DataFrame:
    """Write ``(id, array<int> with values 0..255)`` as a sharded
    positional ``.bvecs`` dataset; returns the shard manifest."""
    return _write(
        df,
        out_dir,
        suffix=".bvecs",
        np_dtype="u1",
        id_col=id_col,
        vec_col=vec_col,
        num_shards=num_shards,
    )


def write_ivecs(
    df: DataFrame,
    out_dir: str,
    id_col: str = "qid",
    vec_col: str = "neighbor_ids",
    num_shards: int | None = None,
) -> DataFrame:
    """Write ``(id, array<int>)`` as a sharded positional ``.ivecs``
    dataset; returns the shard manifest DataFrame."""
    return _write(
        df,
        out_dir,
        suffix=".ivecs",
        np_dtype="<i4",
        id_col=id_col,
        vec_col=vec_col,
        num_shards=num_shards,
    )
