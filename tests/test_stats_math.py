"""chi2_ppf golden values vs R qchisq / scipy.stats.chi2.ppf
(the reference's cutoff source: /root/reference/PRIME_App/utils.R:231)."""

import math

from anomalydetection_spark.functions.stats_math import chi2_cdf, chi2_ppf

GOLDEN = {
    (0.95, 1): 3.841458820694124,
    (0.95, 2): 5.991464547107979,
    (0.99, 2): 9.21034037197618,
    (0.95, 10): 18.307038053275146,
    (0.999, 3): 16.266236196238129,
    (0.5, 4): 3.3566939800333233,
    (0.975, 7): 16.012764274629326,
}


def test_chi2_ppf_golden():
    for (p, df), want in GOLDEN.items():
        got = chi2_ppf(p, df)
        assert math.isclose(got, want, rel_tol=1e-9), (p, df, got, want)


def test_chi2_roundtrip():
    for df in (1, 2, 5, 20, 100):
        for p in (0.01, 0.5, 0.95, 0.999):
            assert math.isclose(chi2_cdf(chi2_ppf(p, df), df), p, rel_tol=1e-8)
