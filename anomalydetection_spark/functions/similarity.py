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


def cosine_near_dup_pairs(emb: DataFrame, threshold: float) -> DataFrame:
    """Exact all-pairs embedding near-dup: (a, b, cosine) with a < b and
    cosine >= threshold.

    This is the audit/oracle path — O(n²·d), correct by construction; run
    it on rerank sets or per-bucket candidates, never the raw corpus. The
    corpus-scale path is :func:`cosine_near_dup_lsh`, which feeds ONLY its
    LSH candidate pairs through the same exact verifier, so its output is
    a subset of this one (precision 1.0 by construction)."""
    a = _flat(emb, "a", "av")
    b = _flat(emb, "b", "bv")
    pairs = a.join(b, "pos").filter(F.col("a") < F.col("b"))
    dots = _dot(pairs, ["a", "b"], "av", "bv", "dot")
    n = norms(emb)
    na = n.select(F.col("vec_id").alias("a"), F.col("norm2").alias("na"))
    nb = n.select(F.col("vec_id").alias("b"), F.col("norm2").alias("nb"))
    return (
        dots.join(na, "a").join(nb, "b")
        .withColumn("cosine", F.round(F.col("dot") / F.sqrt(F.col("na") * F.col("nb")), 8))
        .filter(F.col("cosine") >= F.lit(threshold))
        .select("a", "b", "cosine")
    )


def hyperplanes(spark, dim: int, bits: int, seed: str = "rp") -> DataFrame:
    """(bit, pos, h): deterministic pseudo-random hyperplane entries in
    [-1, 1], derived from md5 so any engine reproduces them. Tiny
    (bits × dim rows) — always broadcast."""
    return (
        spark.range(bits).select(F.col("id").alias("bit"))
        .crossJoin(spark.range(dim).select(F.col("id").alias("pos")))
        .withColumn(
            "h",
            F.conv(F.substring(F.md5(F.concat_ws("_", F.lit(seed), "bit", "pos")), 1, 8), 16, 10)
            .cast("double") / F.lit(float(16**8 - 1)) * 2 - 1,
        )
    )


def rp_band_signatures(emb: DataFrame, planes: DataFrame,
                       rows_per_band: int = 2) -> DataFrame:
    """(vec_id, band, sig): banded random-hyperplane (SRP) signatures.

    sign(v·h_bit) per bit; bits grouped into bands of ``rows_per_band``
    and concatenated into a band signature string. Collision probability
    per bit is 1 − θ/π (θ = angle), so banding tunes recall exactly like
    MinHash LSH. One narrow shuffle of (vec_id, bit) partial sums — the
    embedding column itself never re-shuffles."""
    f = _flat(emb, "vec_id", "v")
    proj = (
        f.join(F.broadcast(planes), "pos")
        .groupBy("vec_id", "bit")
        .agg(
            F.sum((F.col("v").cast("double") * F.col("h")).cast("decimal(28,12)"))
            .cast("double").alias("proj")
        )
        .withColumn("s", F.when(F.col("proj") > 0, F.lit("1")).otherwise(F.lit("0")))
        .withColumn("band", (F.col("bit") / F.lit(rows_per_band)).cast("long"))
    )
    bits_in_band = F.sort_array(F.collect_list(F.struct("bit", "s")))
    return proj.groupBy("vec_id", "band").agg(
        F.array_join(F.transform(bits_in_band, lambda x: x["s"]), "").alias("sig")
    )


def cosine_near_dup_lsh(emb: DataFrame, spark, threshold: float,
                        bits: int = 16, rows_per_band: int = 2,
                        seed: str = "rp") -> DataFrame:
    """Corpus-scale embedding near-dup: SRP-LSH candidate generation +
    exact cosine verification. Returns (a, b, cosine), a < b, cosine >=
    threshold, candidates only — recall < 1 is possible and tunable via
    (bits, rows_per_band); every emitted pair is exact (precision 1.0).

    Scale shape: the corpus is shuffled once by (band, sig) — a key whose
    cardinality grows with n, so AQE splits hot buckets; candidate pairs
    (the quadratic term) exist only within a bucket."""
    dim = emb.select(F.max(F.size("embedding"))).first()[0]
    sigs = rp_band_signatures(emb, hyperplanes(spark, dim, bits, seed), rows_per_band)
    left = sigs.select(F.col("vec_id").alias("a"), "band", "sig")
    right = sigs.select(F.col("vec_id").alias("b"), "band", "sig")
    cand = (
        left.join(right, ["band", "sig"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b").distinct()
    )
    af = _flat(emb, "a", "av")
    bf = _flat(emb, "b", "bv")
    pairs = cand.join(af, "a").join(bf, ["b", "pos"])
    dots = _dot(pairs, ["a", "b"], "av", "bv", "dot")
    n = norms(emb)
    na = n.select(F.col("vec_id").alias("a"), F.col("norm2").alias("na"))
    nb = n.select(F.col("vec_id").alias("b"), F.col("norm2").alias("nb"))
    return (
        dots.join(na, "a").join(nb, "b")
        .withColumn("cosine", F.round(F.col("dot") / F.sqrt(F.col("na") * F.col("nb")), 8))
        .filter(F.col("cosine") >= F.lit(threshold))
        .select("a", "b", "cosine")
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
