"""PII scan/redaction (functions/text.py pii_scan) and distributed
prefix-sum shard packing (functions/sampling.py packed_shards)."""

import pyspark.sql.functions as F
import pytest

from anomalydetection_spark.functions.sampling import packed_shards
from anomalydetection_spark.functions.text import pii_scan


# --------------------------------------------------------------------- PII

@pytest.fixture(scope="module")
def pii_docs(spark):
    rows = [
        (0, "reach me at alice.smith+work@example.co.uk or bob@ex.io"),
        (1, "call 555-867-5309 today"),
        (2, "ssn 078-05-1120 leaked next to server 192.168.0.1"),
        (3, "no pii here at all"),
        (4, None),
        (5, "x 12-345-6789 y 1234-567-8901 z"),   # boundary non-matches
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_counts(pii_docs):
    out = {r["doc_id"]: r for r in pii_scan(pii_docs).collect()}
    assert (out[0]["n_email"], out[0]["n_pii"]) == (2, 2)
    assert (out[1]["n_phone"], out[1]["n_pii"]) == (1, 1)
    assert (out[2]["n_ssn"], out[2]["n_ipv4"], out[2]["n_pii"]) == (1, 1, 2)
    assert out[3]["n_pii"] == 0
    # NULL text -> zero counts (not NULL), NULL redacted
    assert out[4]["n_pii"] == 0 and out[4]["redacted"] is None
    # \b-anchored shapes: wrong digit grouping never matches
    assert out[5]["n_pii"] == 0


def test_pii_redaction_order_and_tags(pii_docs):
    out = {r["doc_id"]: r["redacted"] for r in pii_scan(pii_docs).collect()}
    assert out[0] == "reach me at [EMAIL] or [EMAIL]"
    assert out[1] == "call [PHONE] today"
    assert out[2] == "ssn [SSN] leaked next to server [IPV4]"
    assert out[3] == "no pii here at all"


def test_pii_no_redact_column(pii_docs):
    cols = pii_scan(pii_docs, redact=False).columns
    assert "redacted" not in cols and "n_pii" in cols


# ----------------------------------------------------------- shard packing

@pytest.fixture(scope="module")
def weighted(spark):
    # ids deliberately unsorted + sparse; weights include NULL and a row
    # whose id is NULL (must be dropped)
    rows = [(7, 30), (1, 10), (12, 25), (3, None), (None, 99),
            (5, 40), (9, 15), (2, 60)]
    return spark.createDataFrame(rows, "doc_id long, n_chars long")


def _expected(rows, budget):
    rows = sorted((i, w or 0) for i, w in rows if i is not None)
    acc, out = 0, {}
    for i, w in rows:
        out[i] = (w, acc, acc // budget)
        acc += w
    return out


def test_packed_shards_matches_sequential(weighted):
    got = {r["doc_id"]: (r["weight"], r["cum_before"], r["shard"])
           for r in packed_shards(weighted, budget=50).collect()}
    exp = _expected(
        [(7, 30), (1, 10), (12, 25), (3, None), (None, 99), (5, 40),
         (9, 15), (2, 60)], 50)
    assert got == exp
    assert None not in got


def test_packed_shards_partition_invariant(weighted):
    # the prefix sum must be a pure function of (id order, weights) —
    # identical at every parallelism level, the north-rule requirement
    base = packed_shards(weighted, budget=50, partitions=1).collect()
    for n in (2, 3, 8):
        alt = packed_shards(weighted, budget=50, partitions=n).collect()
        assert sorted(map(tuple, alt)) == sorted(map(tuple, base))


def test_packed_shards_validates_budget(weighted):
    with pytest.raises(ValueError):
        packed_shards(weighted, budget=0)


def test_packed_shards_contiguity(spark):
    # equal weights, budget = 3 units -> shards are contiguous id runs
    # of exactly 3 docs each
    df = spark.range(30).select(
        F.col("id").alias("doc_id"), F.lit(1).alias("n_chars"))
    out = packed_shards(df, budget=3, partitions=4).collect()
    for r in out:
        assert r["shard"] == r["doc_id"] // 3


# ------------------------------------------------------ stratified sampler

def test_stratified_sample_exact_k(spark):
    from anomalydetection_spark.functions.sampling import (
        stratified_sample_exact,
    )
    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("lang"))
    # plant a tiny stratum (2 rows) and a NULL-id row
    extra = spark.createDataFrame(
        [(1000, "rare"), (1001, "rare"), (None, "0")],
        "doc_id long, lang string")
    out = stratified_sample_exact(df.unionByName(extra), 5, ["lang"])
    sizes = {r["lang"]: r["n"] for r in
             out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sizes == {"0": 5, "1": 5, "2": 5, "rare": 2}
    assert out.filter(F.col("doc_id").isNull()).count() == 0
    # deterministic: same call -> same ids
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in
               stratified_sample_exact(df.unionByName(extra), 5,
                                       ["lang"]).collect())
    assert a == b


def test_stratified_sample_group_limit_plan(spark):
    from anomalydetection_spark.functions.sampling import (
        stratified_sample_exact,
    )
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("lang"))
    plan = stratified_sample_exact(df, 5, ["lang"])._jdf \
        .queryExecution().executedPlan().toString()
    # the rank<=k filter must rewrite to a group-limit (per-map-task
    # top-k heaps BEFORE the exchange) — a hot stratum ships ~k rows
    # per task, never its whole membership
    assert "WindowGroupLimit" in plan


def test_stratified_sample_validates_k(spark):
    from anomalydetection_spark.functions.sampling import (
        stratified_sample_exact,
    )
    df = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang"))
    with pytest.raises(ValueError):
        stratified_sample_exact(df, 0, ["lang"])


# -------------------------------------------------------- source shift

def test_source_token_shift_integer_exact(spark):
    from anomalydetection_spark.functions.text import source_token_shift
    docs = spark.createDataFrame(
        [(0, "a a b", "X"), (1, "a b b b", "Y"), (2, "z z z z", "IGNORED")],
        "doc_id long, text string, source string")
    rows = source_token_shift(docs, "X", "Y", k=10).collect()
    # N_a=3, N_b=4; a: |2*4-1*3|=5, b: |1*4-3*3|=5 -> tie breaks token-ASC
    assert [(r["token"], r["n_a"], r["n_b"], r["shift_num"],
             r["share_a_ppm"], r["share_b_ppm"]) for r in rows] == [
        ("a", 2, 1, 5, 666666, 250000),
        ("b", 1, 3, 5, 333333, 750000),
    ]


def test_packed_shards_window_is_partitioned(spark):
    # the running sum must be computed per range-partition (parallel),
    # never as a global no-PARTITION-BY window (single task at any
    # cluster size)
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), F.lit(1).alias("n_chars"))
    plan = packed_shards(df, budget=10)._jdf \
        .queryExecution().executedPlan().toString()
    assert "windowspecdefinition(pid" in plan
    assert "windowspecdefinition(doc_id" not in plan


# --------------------------------------------------------- PiiCheck (suite)

def test_pii_check_in_suite(spark):
    from anomalydetection_spark import ValidationSuite
    from anomalydetection_spark.checks import PiiCheck

    rows = [("img_0", "a scenic lake at dawn"),
            ("img_1", "contact bob@example.com for the original"),
            ("img_2", "call 555-867-5309 to license"),
            ("img_3", None),                           # NULL is NOT pii
            ("img_4", "plain caption")]
    df = spark.createDataFrame(rows, "image_id string, caption string")
    res = ValidationSuite(
        [PiiCheck("caption", keys=["image_id"])], "images").run(df)
    v = {r["image_id"] for r in res.violations.select("image_id").collect()}
    assert v == {"img_1", "img_2"}
    row = res.verdicts.filter("metric = 'violation_rate'").first()
    assert not row["passed"] and abs(row["value"] - 2 / 5) < 1e-12


def test_pii_scan_is_map_only(spark):
    # the scrub pass must stay a single scan-side projection: no
    # Exchange anywhere (the violation count in PiiCheck then rides the
    # suite's fused aggregation for free)
    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text "), F.col("id").cast("string")).alias("text"))
    plan = pii_scan(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_packed_shards_stable_across_reexecution(spark):
    # pid assignment is a pure function of (id, literal boundaries), so
    # a returned frame re-executed later — cache dropped, different
    # cluster state — yields identical values (the range-partitioner
    # form would re-sample boundaries per execution)
    df = spark.range(500).select(
        (F.col("id") * 7 % 501).alias("doc_id"),   # gcd(7,501)=1: unique ids
        (F.col("id") % 17 + 1).alias("n_chars"))
    out = packed_shards(df, budget=100, partitions=8)
    first = sorted(map(tuple, out.collect()))
    spark.catalog.clearCache()
    second = sorted(map(tuple, out.collect()))   # full re-execution
    assert first == second


def test_sampling_input_validation(spark):
    from anomalydetection_spark.functions.sampling import (
        stratified_sample_exact,
    )
    df = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit(1).alias("n_chars"),
        F.lit("en").alias("lang"))
    with pytest.raises(ValueError):
        packed_shards(df, budget=10, partitions=0)
    with pytest.raises(ValueError):
        stratified_sample_exact(df, 5, [])
