"""Python-UDF parity shims for DuckDB scalar functions Spark has no
builtin or SQL-composable equivalent for (string-distance metrics,
Unicode normalization, gamma functions).

These are deliberately row-at-a-time Python UDFs — the SLOW path — and
none of them appears in any workload/pipeline hot path. They exist so
the pass-through SQL surface (SURVEY §2B string/math rows; reference
delegates them to DuckDB's C++ implementations) resolves instead of
failing, with exact-value parity pinned by the differential corpus
(tests/test_dialect_differential.py batch 14). A query that needs one
of these at 100 TB scale should precompute with the vectorized
operators in operators/text.py instead.

Semantics probed against DuckDB (round 7):
- jaro_similarity('', '') = 0.0 (DuckDB returns 0 when EITHER side is
  empty — the textbook algorithm says 1 for two empties)
- damerau_levenshtein is the UNRESTRICTED variant ('ca' → 'abc' is 2),
  not the optimal-string-alignment one (which gives 3)
- strip_accents = NFD → drop combining marks (no recompose needed)
- length_grapheme counts default clusters; this shim counts
  non-combining codepoints, exact for combining sequences (the full
  UAX#29 rules for ZWJ emoji / flags are out of scope and documented)
"""

from __future__ import annotations

import math
import unicodedata


def jaro(s1: str | None, s2: str | None) -> float | None:
    if s1 is None or s2 is None:
        return None
    if not s1 or not s2:
        return 0.0  # DuckDB: empty side → 0, even for two empties
    if s1 == s2:
        return 1.0
    n1, n2 = len(s1), len(s2)
    window = max(n1, n2) // 2 - 1
    m1 = [False] * n1
    m2 = [False] * n2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - window)
        hi = min(n2, i + window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    j = 0
    for i in range(n1):
        if m1[i]:
            while not m2[j]:
                j += 1
            if s1[i] != s2[j]:
                transpositions += 1
            j += 1
    t = transpositions // 2
    return (matches / n1 + matches / n2 + (matches - t) / matches) / 3.0


def jaro_winkler(s1: str | None, s2: str | None) -> float | None:
    j = jaro(s1, s2)
    if j is None:
        return None
    prefix = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        prefix += 1
    return j + prefix * 0.1 * (1.0 - j)


def damerau_levenshtein(s1: str | None, s2: str | None) -> int | None:
    """Unrestricted Damerau-Levenshtein (matches DuckDB: 'ca'→'abc' = 2)."""
    if s1 is None or s2 is None:
        return None
    n1, n2 = len(s1), len(s2)
    if n1 == 0:
        return n2
    if n2 == 0:
        return n1
    inf = n1 + n2
    da: dict[str, int] = {}
    d = [[inf] * (n2 + 2) for _ in range(n1 + 2)]
    d[0][0] = inf
    for i in range(n1 + 1):
        d[i + 1][0] = inf
        d[i + 1][1] = i
    for j in range(n2 + 1):
        d[0][j + 1] = inf
        d[1][j + 1] = j
    for i in range(1, n1 + 1):
        db = 0
        for j in range(1, n2 + 1):
            k = da.get(s2[j - 1], 0)
            l = db
            if s1[i - 1] == s2[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,  # substitution
                d[i + 1][j] + 1,  # insertion
                d[i][j + 1] + 1,  # deletion
                d[k][l] + (i - k - 1) + 1 + (j - l - 1),  # transposition
            )
        da[s1[i - 1]] = i
    return d[n1 + 1][n2 + 1]


def strip_accents(s: str | None) -> str | None:
    if s is None:
        return None
    return "".join(
        c for c in unicodedata.normalize("NFD", s) if not unicodedata.combining(c)
    )


def nfc_normalize(s: str | None) -> str | None:
    if s is None:
        return None
    return unicodedata.normalize("NFC", s)


def length_grapheme(s: str | None) -> int | None:
    if s is None:
        return None
    return sum(1 for c in s if not unicodedata.combining(c))


def _gamma(x) -> float | None:
    if x is None:
        return None
    try:
        return math.gamma(float(x))
    except (ValueError, OverflowError):
        return None


def _lgamma(x) -> float | None:
    if x is None:
        return None
    try:
        return math.lgamma(float(x))
    except (ValueError, OverflowError):
        return None


_REGISTERED: set[int] = set()


def register(spark) -> None:
    """Register the shims under their DuckDB names (idempotent per
    SparkSession). Called from session.get_spark."""
    key = id(spark)
    if key in _REGISTERED:
        return
    # module-level functions are pickled BY REFERENCE — workers must be
    # able to import this package even when the driver's cwd is outside
    # the repo (caught by an end-to-end drive from /tmp, round 7)
    from vscode_parquet_visualizer_spark.session import ship_package

    ship_package(spark)
    from pyspark.sql.types import DoubleType, IntegerType, StringType

    spark.udf.register("jaro_similarity", jaro, DoubleType())
    spark.udf.register("jaro_winkler_similarity", jaro_winkler, DoubleType())
    spark.udf.register(
        "damerau_levenshtein", damerau_levenshtein, IntegerType()
    )
    spark.udf.register("strip_accents", strip_accents, StringType())
    spark.udf.register("nfc_normalize", nfc_normalize, StringType())
    spark.udf.register("length_grapheme", length_grapheme, IntegerType())
    spark.udf.register("gamma", _gamma, DoubleType())
    spark.udf.register("lgamma", _lgamma, DoubleType())
    _REGISTERED.add(key)
