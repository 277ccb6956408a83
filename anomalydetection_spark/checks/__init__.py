from anomalydetection_spark.checks.base import Check, VERDICT_SCHEMA, VIOLATION_KEY_COL
from anomalydetection_spark.checks.column_stats import ColumnStatsCheck
from anomalydetection_spark.checks.row_constraints import (
    NotNullCheck,
    InSetCheck,
    NotInSetCheck,
    PiiCheck,
    RlikeCheck,
    RangeCheck,
    RowCountCheck,
    PredicateCheck,
)
from anomalydetection_spark.checks.uniqueness import UniquenessCheck
from anomalydetection_spark.checks.referential import ReferentialCheck
from anomalydetection_spark.checks.drift import DriftCheck, histogram, psi_from_histograms, ks_from_histograms
from anomalydetection_spark.checks.anomaly import RobustZScoreCheck, MahalanobisCheck
from anomalydetection_spark.checks.schema import SchemaCheck, reconcile_schema

__all__ = [
    "Check",
    "VERDICT_SCHEMA",
    "VIOLATION_KEY_COL",
    "ColumnStatsCheck",
    "NotNullCheck",
    "InSetCheck",
    "NotInSetCheck",
    "PiiCheck",
    "RlikeCheck",
    "RangeCheck",
    "RowCountCheck",
    "PredicateCheck",
    "SchemaCheck",
    "reconcile_schema",
    "UniquenessCheck",
    "ReferentialCheck",
    "DriftCheck",
    "histogram",
    "psi_from_histograms",
    "ks_from_histograms",
    "RobustZScoreCheck",
    "MahalanobisCheck",
]
