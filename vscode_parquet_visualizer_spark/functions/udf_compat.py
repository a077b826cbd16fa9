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


def _gcd(a, b) -> int | None:
    if a is None or b is None:
        return None
    return math.gcd(int(a), int(b))


def _lcm(a, b) -> int | None:
    if a is None or b is None:
        return None
    return math.lcm(int(a), int(b))


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


_JSON_NUM_ORDER = {"NULL": 0, "UBIGINT": 1, "BIGINT": 2, "DOUBLE": 3}


def _json_unify(a, b):
    if a == b:
        return a
    if a == "NULL":
        return b
    if b == "NULL":
        return a
    if isinstance(a, dict) and isinstance(b, dict):
        out = dict(a)
        for k, v in b.items():
            out[k] = _json_unify(out[k], v) if k in out else v
        return out
    if isinstance(a, list) and isinstance(b, list):
        return [_json_unify(a[0], b[0])]
    if a in _JSON_NUM_ORDER and b in _JSON_NUM_ORDER:
        return a if _JSON_NUM_ORDER[a] >= _JSON_NUM_ORDER[b] else b
    return "JSON"


def _json_struct_of(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "BOOLEAN"
    if isinstance(v, int):
        return "UBIGINT" if v >= 0 else "BIGINT"
    if isinstance(v, float):
        return "DOUBLE"
    if isinstance(v, str):
        return "VARCHAR"
    if isinstance(v, dict):
        return {k: _json_struct_of(x) for k, x in v.items()}
    if isinstance(v, list):
        if not v:
            return ["NULL"]
        out = _json_struct_of(v[0])
        for x in v[1:]:
            out = _json_unify(out, _json_struct_of(x))
        return [out]
    return "JSON"


def json_structure(j: str | None) -> str | None:
    """DuckDB json_structure: the value's shape with scalar type names;
    heterogeneous arrays collapse to ["JSON"], numerics widen
    NULL→UBIGINT→BIGINT→DOUBLE, object arrays merge keys (probed)."""
    import json as _json

    if j is None:
        return None
    try:
        v = _json.loads(j)
    except ValueError:
        return None
    return _json.dumps(_json_struct_of(v), separators=(",", ":"))


def md5_number_lower(s: str | None):
    """DuckDB md5_number_lower: the md5 digest's SECOND 8 bytes as a
    little-endian unsigned 64-bit integer (probed against duck v1.0)."""
    if s is None:
        return None
    import hashlib
    from decimal import Decimal

    d = hashlib.md5(s.encode("utf-8")).digest()
    return Decimal(int.from_bytes(d[8:16], "little"))


def md5_number_upper(s: str | None):
    """DuckDB md5_number_upper: the digest's FIRST 8 bytes,
    little-endian unsigned."""
    if s is None:
        return None
    import hashlib
    from decimal import Decimal

    d = hashlib.md5(s.encode("utf-8")).digest()
    return Decimal(int.from_bytes(d[:8], "little"))


def json_canonical(j: str | None) -> str | None:
    """DuckDB ``json(x)``: parse and re-emit minified canonical JSON
    text (whitespace dropped, key order preserved — probed v1.0).
    Invalid input → NULL (DuckDB errors; NULL is the engine's lenient
    posture, same as the arrow family's)."""
    if j is None:
        return None
    import json as _json

    try:
        return _json.dumps(_json.loads(j), separators=(",", ":"))
    except ValueError:
        return None


def json_quote(v) -> str | None:
    """DuckDB json_quote: render any value as JSON text (strings gain
    quotes, numbers/bools pass through, containers serialize)."""
    if v is None:
        return None
    import json

    try:
        return json.dumps(v, separators=(",", ":"))
    except TypeError:
        return json.dumps(str(v))


def json_merge_patch(a: str | None, b: str | None) -> str | None:
    """RFC 7386 merge patch (DuckDB json_merge_patch): recursive object
    merge, null deletes, non-object patch replaces wholesale."""
    import json as _json

    if a is None or b is None:
        return None

    def patch(target, p):
        if not isinstance(p, dict):
            return p
        out = dict(target) if isinstance(target, dict) else {}
        for k, v in p.items():
            if v is None:
                out.pop(k, None)
            else:
                out[k] = patch(out.get(k), v)
        return out

    try:
        va, vb = _json.loads(a), _json.loads(b)
    except ValueError:
        return None
    return _json.dumps(patch(va, vb), separators=(",", ":"))


def json_type_of(j: str | None) -> str | None:
    """DuckDB json_type scalar names (OBJECT/ARRAY/VARCHAR/UBIGINT/
    BIGINT/DOUBLE/BOOLEAN/NULL). The 2-arg path form is spliced to
    json_type(json_extract(j, path)) by the dialect."""
    import json as _json

    if j is None:
        return None
    try:
        v = _json.loads(j)
    except ValueError:
        return None
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "BOOLEAN"
    if isinstance(v, int):
        return "UBIGINT" if v >= 0 else "BIGINT"
    if isinstance(v, float):
        return "DOUBLE"
    if isinstance(v, str):
        return "VARCHAR"
    if isinstance(v, dict):
        return "OBJECT"
    return "ARRAY"


def json_contains(haystack: str | None, needle: str | None) -> bool | None:
    """DuckDB json_contains: the needle value is contained anywhere in
    the haystack — recursive descent, set-like array containment,
    subset object containment (probed: {"b":1} IS in {"a":{"b":1}})."""
    import json as _json

    if haystack is None or needle is None:
        return None

    def c(h, n):
        if type(h) is type(n) and h == n:
            return True
        if isinstance(h, dict):
            if isinstance(n, dict) and all(
                k in h and c(h[k], v) for k, v in n.items()
            ):
                return True
            return any(c(v, n) for v in h.values())
        if isinstance(h, list):
            if isinstance(n, list) and all(
                any(c(e, x) for e in h) for x in n
            ):
                return True
            return any(c(e, n) for e in h)
        return False

    try:
        return c(_json.loads(haystack), _json.loads(needle))
    except ValueError:
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
    from pyspark.sql.types import LongType

    spark.udf.register("gcd", _gcd, LongType())
    spark.udf.register("lcm", _lcm, LongType())
    spark.udf.register("greatest_common_divisor", _gcd, LongType())
    spark.udf.register("least_common_multiple", _lcm, LongType())
    spark.udf.register("json_structure", json_structure, StringType())
    spark.udf.register("json_merge_patch", json_merge_patch, StringType())
    from pyspark.sql.types import BooleanType

    spark.udf.register("json_type", json_type_of, StringType())
    spark.udf.register("json_contains", json_contains, BooleanType())
    spark.udf.register("json_quote", json_quote, StringType())
    spark.udf.register("json", json_canonical, StringType())
    from pyspark.sql.types import DecimalType

    spark.udf.register(
        "md5_number_lower", md5_number_lower, DecimalType(20, 0)
    )
    spark.udf.register(
        "md5_number_upper", md5_number_upper, DecimalType(20, 0)
    )
    _REGISTERED.add(key)
