"""Embedding similarity search: brute-force cosine and IVF-bucketed ANN.

The corpus-scale problem: top-k neighbors over an ``array<float>`` column.
Brute force is a cross join — O(n·q) dot products; fine for rerank sets,
fatal at 10^12 rows. The scale path here is **IVF (inverted file)**:
assign every vector to its nearest of C coarse centroids (one broadcast
join against a C-row dimension — no shuffle of the corpus), then answer a
query only within its centroid's bucket (equi-join on ``bucket``), cutting
the candidate set ~C× per probe. Recall/cost trades by probing the p
nearest buckets instead of 1.

All dot products run as exact-decimal sums over ``posexplode`` pairs so an
independent engine (the DuckDB oracle) reproduces every value bit-for-bit;
the production fast path would keep the same plan shape with a vectorized
``F.zip_with``/pandas-UDF kernel instead of the decimal fold.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _flat(df: DataFrame, id_alias: str, vec_alias: str,
          extra: dict[str, str] | None = None) -> DataFrame:
    """(id, pos, v) flattened embedding elements as exact doubles."""
    cols = [F.col("vec_id").alias(id_alias)]
    for src, dst in (extra or {}).items():
        cols.append(F.col(src).alias(dst))
    return df.select(*cols, F.posexplode("embedding").alias("pos", vec_alias))


def _dot(df: DataFrame, group_cols: list[str], a: str, b: str, alias: str) -> DataFrame:
    """Exact (order-insensitive) decimal-sum dot product."""
    return df.groupBy(*group_cols).agg(
        F.sum((F.col(a).cast("double") * F.col(b).cast("double")).cast("decimal(28,12)"))
        .cast("double").alias(alias)
    )


def norms(emb: DataFrame) -> DataFrame:
    """(vec_id, norm2) exact squared L2 norms."""
    f = _flat(emb, "vec_id", "v")
    return _dot(f.withColumn("v2", F.col("v")), ["vec_id"], "v", "v2", "norm2")


def ivf_assign(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, bucket, cos_to_centroid): nearest centroid by cosine.

    ``centroids``: (vec_id, embedding) — tiny (C rows), so the element
    join broadcasts; the corpus is never shuffled."""
    v = _flat(emb, "vid", "v")
    c = _flat(centroids, "cid", "c")
    dots = _dot(v.join(F.broadcast(c), "pos"), ["vid", "cid"], "v", "c", "dot")
    nv = norms(emb).select(F.col("vec_id").alias("vid"), F.col("norm2").alias("nv"))
    nc = norms(centroids).select(F.col("vec_id").alias("cid"), F.col("norm2").alias("nc"))
    cos = (
        dots.join(nv, "vid").join(F.broadcast(nc), "cid")
        .withColumn("cos", F.round(F.col("dot") / F.sqrt(F.col("nv") * F.col("nc")), 8))
    )
    w = Window.partitionBy("vid").orderBy(F.desc("cos"), F.asc("cid"))
    return (
        cos.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(F.col("vid").alias("vec_id"), F.col("cid").alias("bucket"),
                F.col("cos").alias("cos_to_centroid"))
    )


def ivf_topk(emb: DataFrame, centroids: DataFrame, query_pred,
             k: int = 5) -> DataFrame:
    """Top-k cosine neighbors per query, searched ONLY within the query's
    IVF bucket (single-probe). Returns (qid, cid, cosine, rk, bucket)."""
    assign = ivf_assign(emb, centroids).select("vec_id", "bucket")
    tagged = emb.join(assign, "vec_id")
    q = tagged.filter(query_pred(F.col("vec_id")))
    qf = _flat(q, "qid", "qv", extra={"bucket": "qbucket"})
    cf = _flat(tagged, "cid", "cv", extra={"bucket": "cbucket"})
    pairs = qf.join(cf, "pos").filter(
        (F.col("qbucket") == F.col("cbucket")) & (F.col("qid") != F.col("cid"))
    )
    dots = _dot(pairs, ["qid", "cid", "qbucket"], "qv", "cv", "dot")
    n = norms(emb)
    nq = n.select(F.col("vec_id").alias("qid"), F.col("norm2").alias("nq"))
    ncand = n.select(F.col("vec_id").alias("cid"), F.col("norm2").alias("nc"))
    cos = (
        dots.join(nq, "qid").join(ncand, "cid")
        .withColumn("cosine", F.round(F.col("dot") / F.sqrt(F.col("nq") * F.col("nc")), 8))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        cos.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "cid", "cosine", "rk", F.col("qbucket").alias("bucket"))
    )
