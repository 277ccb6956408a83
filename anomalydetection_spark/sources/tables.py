"""Table IO behind one module so the engine's code paths don't care
whether the catalog is Iceberg or a parquet directory.

The reference read whole parquet objects from S3 and pruned columns
AFTER materializing (``/root/reference/PRIME_App/server.R:77-124``);
here reads are lazy DataFrames, so projection/predicates reach the scan
(Catalyst pushdown) and Iceberg partition transforms replace the
reference's filename-regex routing (``server.R:678-742``).

In this sandbox there is no Iceberg jar, so ``load_table`` falls back to
plain parquet — the calling code is identical either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Load one named table. Iceberg catalog if configured, else parquet."""
    catalog = spark.conf.get("spark.sql.catalog.validation", None)
    if catalog:
        return spark.read.table(f"validation.{name}")
    base = sf_dir or DEFAULT_SF_DIR
    return spark.read.parquet(f"{base}/{name}.parquet")


def load_csv(
    spark: SparkSession,
    path: str,
    schema=None,
    delimiter: str = ",",
    header: bool = True,
    normalize_empty: tuple[str, ...] | list[str] = (),
    n_rows: int | None = None,
) -> DataFrame:
    """CSV/TSV source (reference operator S4, ``App/app.R:608-622``; TSV
    via ``delimiter='\\t'``), with scan-time empty-string → NULL
    normalization on the named columns (S5, ``PRIME_App/server.R:
    105-121`` — NA-ness is semantically load-bearing downstream) and an
    optional row limit (S6, ``server.R:92-95``).

    Pass an explicit ``schema`` in production — inference scans the file
    twice and is only acceptable for interactive use."""
    from pyspark.sql import functions as F

    reader = spark.read.option("header", str(header).lower()).option("sep", delimiter)
    reader = reader.schema(schema) if schema is not None else reader.option(
        "inferSchema", "true"
    )
    df = reader.csv(path)
    for c in normalize_empty:
        df = df.withColumn(c, F.nullif(F.col(c), F.lit("")))
    if n_rows is not None:
        df = df.limit(n_rows)
    return df


def load_all(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    return {t: load_table(spark, t, sf_dir) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every testdata table as a temp view for spark.sql paths."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def write_table(df: DataFrame, path_or_name: str, mode: str = "overwrite") -> None:
    """Sink: Iceberg ``writeTo(...).append()`` when cataloged, else parquet.

    Replaces the reference's styled-Excel sink (``PRIME_App/server.R:
    2219-2456``) with queryable result tables (verdicts/violations/
    metrics/lineage)."""
    spark = df.sparkSession
    catalog = spark.conf.get("spark.sql.catalog.validation", None)
    if catalog:
        if mode == "append":
            df.writeTo(f"validation.{path_or_name}").append()
        else:
            df.writeTo(f"validation.{path_or_name}").createOrReplace()
    else:
        df.write.mode(mode).parquet(path_or_name)
