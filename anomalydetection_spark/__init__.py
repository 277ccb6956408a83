"""anomalydetection_spark — a PySpark-native schema + constraint validation engine.

A from-scratch re-expression of the capabilities of the R reference
(JDFPalladium/AnomalyDetection, surveyed in /root/repo/SURVEY.md) as a
distributed validation engine over very large tables of image/caption
pairs: single-pass column statistics, uniqueness (HLL + exact), broadcast
referential checks, distribution drift (PSI / binned KS), robust z-score
and Mahalanobis anomaly scoring, per-partition verdicts, and a resumable
checkpoint ledger.

Everything is declared with the DataFrame API so Catalyst handles pushdown,
pruning, partial aggregation and join strategy; Python touches data only in
Arrow-vectorized pandas UDFs (image decode, grouped time-series kernels).
"""

from anomalydetection_spark.session import get_spark
from anomalydetection_spark.suite import ValidationSuite, SuiteResult

__all__ = ["get_spark", "ValidationSuite", "SuiteResult"]
__version__ = "0.1.0"
