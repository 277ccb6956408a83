"""Physical-plan discipline: the properties that make the engine viable
at 10^12 rows, asserted on `.explain` output so regressions are caught.

- predicate pushdown + column pruning reach the parquet scan
- small dimensions broadcast (no shuffle of the fact side)
- the bytes column never crosses a shuffle (decode is map-only)
- skew helpers produce the two-level plan they promise
"""

import re

import pyspark.sql.functions as F
import pytest

from anomalydetection_spark.checks import InSetCheck, RangeCheck, ReferentialCheck
from anomalydetection_spark.functions.skew import heavy_hitters, salted_group_count
from anomalydetection_spark.image_udfs import decode_results
from anomalydetection_spark.synth import generate_pandas, to_spark


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def images_path(spark, tmp_path_factory):
    pdf, _ = generate_pandas(500, with_payload=True)
    path = str(tmp_path_factory.mktemp("plans") / "images")
    to_spark(spark, pdf).write.mode("overwrite").parquet(path)
    return path


def test_violation_filter_pushes_down_to_scan(spark, images_path):
    df = spark.read.parquet(images_path)
    check = RangeCheck("w", 16, 2048, keys=["image_id"])
    plan = plan_of(check.violations(df))
    assert "PushedFilters:" in plan
    # the range predicate reaches the parquet reader (negated form may
    # normalize; the column must appear in pushed filters)
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan).group(1)
    assert "w" in pushed
    # column pruning: ReadSchema carries only image_id + w, never bytes
    schema = re.search(r"ReadSchema: struct<([^>]*)>", plan).group(1)
    assert "bytes" not in schema and "caption" not in schema


def test_stats_frame_prunes_scan_columns(spark, images_path):
    from anomalydetection_spark.plans.image_suite import build_image_suite

    df = spark.read.parquet(images_path)
    suite = build_image_suite(["jpeg", "png", "webp"], with_decode=True)
    plan = plan_of(suite._stats_frame(df).groupBy("fmt").count())
    schema = re.search(r"ReadSchema: struct<([^>]*)>", plan).group(1)
    assert "bytes" not in schema, "stats pass must never scan payload bytes"


def test_referential_uses_broadcast_join(spark, images_path):
    df = spark.read.parquet(images_path)
    dim = spark.createDataFrame([("jpeg",), ("png",), ("webp",)], "fmt string")
    check = ReferentialCheck("fmt", dim, keys=["image_id", "fmt"])
    plan = plan_of(check.violations(df))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan, "fact side must not shuffle for a tiny dim"


def test_list_dim_referential_is_pure_scan_predicate(spark, images_path):
    df = spark.read.parquet(images_path)
    check = InSetCheck("fmt", ["jpeg", "png", "webp"], keys=["image_id"])
    plan = plan_of(check.violations(df))
    assert "Join" not in plan, "constant whitelist must compile to a predicate"


def test_decode_path_is_map_only(spark, images_path):
    df = spark.read.parquet(images_path)
    plan = plan_of(decode_results(df))
    assert "Exchange" not in plan, "bytes must never cross a shuffle"
    schema = re.search(r"ReadSchema: struct<([^>]*)>", plan).group(1)
    # narrow projection: bytes + the invariant inputs (caption, phash —
    # 8 B/row), never the unused metadata columns
    cols = {c.split(":")[0] for c in schema.split(",")}
    assert "bytes" in cols and "w" not in cols and "h" not in cols


def test_decode_runs_once_per_suite_run(spark, images_path):
    """VERDICT r02 #2: the aggregate in run_extra and the violations()
    filter must share ONE mapInPandas decode execution — the narrow
    verdict frame is persisted for the run, so the violations plan reads
    the in-memory cache instead of re-decoding every image."""
    from anomalydetection_spark.image_udfs import DecodeCheck
    from anomalydetection_spark.suite import ValidationSuite

    df = spark.read.parquet(images_path)
    check = DecodeCheck(max_violation_rate=1.0, max_caption_mismatch_rate=1.0)
    suite = ValidationSuite([check], table_name="imgs")
    res = suite.run(df, spark)
    try:
        # the decode-result frame was materialized (cached) by run_extra
        assert check._results is not None
        assert check._results.storageLevel.useMemory
        # violations re-read the cache — no second decode stage
        viol_plan = check.violations(df)._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in viol_plan
        assert res.violations.count() >= 0  # materializes via the cache
    finally:
        suite.release()
    assert not check._results.storageLevel.useMemory  # released


def test_salted_count_matches_plain_and_has_two_levels(spark, images_path):
    df = spark.read.parquet(images_path)
    plain = {tuple(r)[:-1]: r["count"]
             for r in df.groupBy("fmt").count().collect()}
    salted = {tuple(r)[:-1]: r["count"]
              for r in salted_group_count(df, ["fmt"], n_salt=8).collect()}
    assert plain == salted
    plan = plan_of(salted_group_count(df, ["fmt"], n_salt=8))
    assert plan.count("Exchange") >= 2  # level-1 (keys+salt) and level-2 (keys)


def test_heavy_hitters_finds_hot_phash(spark, images_path):
    from anomalydetection_spark.synth import HOT_PHASH

    df = spark.read.parquet(images_path)
    hot = heavy_hitters(df, "phash", min_share=0.005, sample_fraction=1.0)
    vals = {r["phash"] for r in hot.collect()}
    assert HOT_PHASH in vals  # the planted ~1% hot key is detected

    # one pre-pass job only (VERDICT r02 #8): building the plan runs the
    # metadata-only df.count() and nothing else — no second sample scan
    sc = spark.sparkContext
    sc.setJobGroup("hh_prepass", "heavy_hitters pre-pass job count")
    try:
        heavy_hitters(df, "phash", min_share=0.005)  # plan only, no collect
    finally:
        sc.setJobGroup(None, None)
    jobs = sc._jsc.sc().statusTracker().getJobIdsForGroup("hh_prepass")
    # the metadata-only count() costs ≤2 jobs under AQE; the old second
    # pre-pass (a full sample scan + count) would add ≥2 more
    assert len(list(jobs)) <= 2, list(jobs)


def test_tfidf_with_supplied_n_docs_runs_zero_jobs_at_plan_time(spark):
    """tfidf_top_terms(n_docs=...) must not run the hidden eager
    distinct-count (the heavy_hitters total_rows escape hatch): building
    the plan with the count supplied launches ZERO jobs, so an expensive
    upstream lineage is never executed twice."""
    from anomalydetection_spark.functions.text import tfidf_top_terms

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sc = spark.sparkContext
    sc.setJobGroup("tfidf_plan", "tfidf plan-time job count")
    try:
        tfidf_top_terms(docs, k=3, n_docs=500)  # plan only, no action
    finally:
        sc.setJobGroup(None, None)
    jobs = sc._jsc.sc().statusTracker().getJobIdsForGroup("tfidf_plan")
    assert len(list(jobs)) == 0, list(jobs)


def test_near_dup_pair_stage_broadcasts_and_never_shuffles_embeddings(spark):
    from anomalydetection_spark.functions.similarity import cosine_near_dup_pairs

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = plan_of(cosine_near_dup_pairs(emb, 0.35))
    # block kernel: one map-only pass over the corpus; the O(n^2) pair
    # set lives inside the Arrow batch, never as plan rows — so the plan
    # has no join and no shuffle of embeddings at all
    assert "MapInPandas" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "Join" not in plan


def test_ivf_probe_join_broadcasts_query_side(spark):
    import pyspark.sql.functions as F2

    from anomalydetection_spark.functions.similarity import ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    centroids = emb.filter(F2.col("vec_id") < 4)
    plan = plan_of(ivf_topk(emb, centroids, lambda v: v < 8, k=3))
    assert "BroadcastExchange" in plan  # query side is broadcast by construction


def test_ivf_assignment_is_map_side_no_exchange(spark):
    """Centroid assignment must not shuffle the n×C pair set: scoring and
    the top-1/top-p pick are a projection over the corpus scan (centroids
    inlined as a literal), so the whole plan is Exchange-free."""
    import pyspark.sql.functions as F2

    from anomalydetection_spark.functions.similarity import (
        ivf_assign,
        ivf_probe_buckets,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    centroids = emb.filter(F2.col("vec_id") < 4)
    for df in (ivf_assign(emb, centroids), ivf_probe_buckets(emb, centroids, 2)):
        plan = plan_of(df)
        assert "Exchange" not in plan
        assert "Window" not in plan


def test_arrow_centroid_fallback_plan_is_map_only_no_giant_literal(spark):
    """VERDICT r04 #1 plan guard: above the literal budget the scorer
    must be a MapInPandas projection — still Exchange-free, and the
    C·dim centroid floats ride the kernel closure, NOT the plan (no
    inlined centroid literal; plan string stays small)."""
    import pyspark.sql.functions as F2

    from anomalydetection_spark.functions.similarity import (
        ivf_assign,
        pq_encode,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    centroids = emb.filter(F2.col("vec_id") < 4)
    plan = plan_of(ivf_assign(emb, centroids, literal_budget=0))
    assert "MapInPandas" in plan
    assert "Exchange" not in plan and "Window" not in plan
    # the literal plan inlines C*dim floats; the kernel plan must not
    lit_plan = plan_of(ivf_assign(emb, centroids))
    assert len(plan) < len(lit_plan) / 4, (len(plan), len(lit_plan))

    enc_plan = plan_of(pq_encode(emb, m=8, n_codes=8, literal_budget=0))
    assert "MapInPandas" in enc_plan and "Exchange" not in enc_plan
    lit_enc = plan_of(pq_encode(emb, m=8, n_codes=8))
    assert len(enc_plan) < len(lit_enc) / 4, (len(enc_plan), len(lit_enc))


def test_ivf_layout_probe_scan_prunes_partitions_and_matches_unpruned(spark, tmp_path):
    """VERDICT r03 #2: over a write_ivf_layout-materialized corpus the
    IVF probe filter must be REAL partition pruning — the scan's
    PartitionFilters carries the bucket predicate (only n_probe of the
    n_buckets directories are listed/read), the pruned scan never reads
    the float embedding column, and the results are identical to the
    unpruned ivf_pq_topk on the same corpus and params."""
    from anomalydetection_spark.functions.similarity import (
        _query_vector,
        ivf_pq_topk,
        ivf_pq_topk_pruned,
        pq_codebooks,
        write_ivf_layout,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    centroids = emb.filter(F.col("vec_id") < 8).select("vec_id", "embedding")
    codebooks = pq_codebooks(emb, m=8, n_codes=8)
    path = str(tmp_path / "ivf_layout")
    write_ivf_layout(emb, centroids, path, m=8, n_codes=8, codebooks=codebooks)

    q = _query_vector(emb, 10)
    pruned = ivf_pq_topk_pruned(spark, path, centroids, codebooks, q,
                                k=10, n_probe=2)
    plan = plan_of(pruned)
    seg = plan[plan.index("PartitionFilters"):]
    seg = seg[:seg.index("\n")]
    assert "bucket" in seg and ("IN" in seg or "in" in seg), seg
    # codes-only serving scan: the float vectors never leave storage
    rs = plan[plan.index("ReadSchema"):]
    rs = rs[:rs.index("\n")]
    assert "codes" in rs and "embedding" not in rs, rs

    base = ivf_pq_topk(emb, query_id=10, k=10, n_buckets=8, n_probe=2)
    assert [tuple(r) for r in pruned.collect()] == \
           [tuple(r) for r in base.collect()]


def test_routed_partition_scan_prunes_partitions(spark):
    """S2 routed scan: the event_type routing predicate must reach the
    scan as a PartitionFilter (only the routed directories are read)."""
    import __spark_entry__ as E

    df = E.q_routed_partition_scan(spark, "/root/testdata/sf0.001")
    plan = plan_of(df)
    seg = plan[plan.index("PartitionFilters"):]
    seg = seg[:seg.index("\n")]
    assert "click" in seg and "purchase" in seg


def test_packed_series_kernel_spreads_python_stage(spark):
    """The K2 packed-series frame is byte-small, so AQE's size-based
    coalescing would collapse it to one task and serialize the CPU-bound
    scoring UDF. The kernel must carry an explicit (AQE-exempt)
    round-robin repartition between the pack and the Python stage."""
    from anomalydetection_spark.kernels.timeseries import run_time_series

    df = spark.range(2000).select(
        (F.col("id") % 100).alias("sid"),
        (F.col("id") / 100).cast("int").alias("period"),
        (F.col("id") % 7).cast("double").alias("value"),
    )
    out = run_time_series(df, ["sid"], "period", "value",
                          season=4, min_recent=8)
    plan = plan_of(out)
    pos_rr = plan.find("RoundRobinPartitioning")
    pos_py = plan.find("MapInPandas")
    assert pos_rr != -1, plan
    assert pos_py != -1, plan
    # explicit knob is honored too
    out4 = run_time_series(df, ["sid"], "period", "value",
                           season=4, min_recent=8, num_partitions=4)
    assert "RoundRobinPartitioning(4" in plan_of(out4)


def test_repetition_signals_plan_two_level_aggs_no_cross_product(spark):
    """repetition_signals' scale contract: line and n-gram metrics are
    keyed aggregations with map-side partial combine (the tfidf shuffle
    shape) and the doc-level joins never degenerate into a cross
    product — at 10^12 docs a NestedLoop/Cartesian here is fatal."""
    from anomalydetection_spark.functions.text import repetition_signals

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = plan_of(repetition_signals(docs))
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    # two-level aggregation: partial_count before the exchange for both
    # the (id, line) and (id, n, gram) groupings
    assert plan.count("partial_count") >= 2
