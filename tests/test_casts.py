"""guarded_try_cast must be value-identical to plain try_cast on string
inputs — the guard is a SUPERSET of Spark's accept set, so the only rows
it short-circuits are rows try_cast would NULL anyway.

The corpus mixes the empirically-tricky cases (suffix floats, hex floats,
signed inf/nan case variants, space-vs-tab trimming, overflow) with
deterministic pseudo-random junk strings.
"""

from __future__ import annotations

import random
import string

import pytest
from pyspark.sql import functions as F

from vscode_parquet_visualizer_spark.functions.casts import guarded_try_cast

ADVERSARIAL = [
    "", " ", "0", "007", "+7", "-7", " +0012 ", "1.5", ".5", "5.", "1e2",
    "1e+308", "12e400", "1E-3", "+.5e-2", "1.5d", "1.5f", "1.5D", "1.5F",
    "1e5f", "0x1p3", "0X.8P1", "0x1.8p-2", "0xABp2", "Infinity", "-Infinity",
    "+Infinity", "INFINITY", "infinity", "Inf", "-inf", "+inf", "NaN",
    "-NaN", "+nan", "nan", "NAN", "- 5", "1 5", " 1. 5", "1,5", "1_000",
    "\t8", "8\n", "\x008", "\x1f8", "\xa08", "\u20028", " 5", "5 ",
    "1-URGENT", "F", "O", "P",
    "2147483647", "2147483648", "-2147483648", "-2147483649",
    "9223372036854775807", "9223372036854775808", "e5", "1e", ".", "+", "-",
    "++1", "--1", "+-1", "1.", ".e5", "0x", "0xp1", "1px", "Infinityf",
    "NaNd", "none", "null", "N/A", "1.0.0", "12 34", "١٢٣", "Ⅻ", "⑤",
]


def _junk(n: int, seed: int = 7) -> list[str]:
    rng = random.Random(seed)
    alphabet = string.printable[:-5] + "±€٣"
    return ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12)))
            for _ in range(n)]


@pytest.mark.parametrize("dtype", ["int", "bigint", "smallint", "double", "float"])
def test_guarded_matches_plain_try_cast(spark, dtype):
    corpus = ADVERSARIAL + _junk(300)
    df = spark.createDataFrame([(s,) for s in corpus], "s string")
    out = df.select(
        "s",
        F.col("s").try_cast(dtype).alias("plain"),
        guarded_try_cast(F.col("s"), dtype).alias("guarded"),
    ).collect()
    for row in out:
        # NaN != NaN — compare via repr
        assert repr(row.plain) == repr(row.guarded), (
            f"{dtype}: {row.s!r} plain={row.plain!r} guarded={row.guarded!r}"
        )


def test_non_numeric_type_passthrough(spark):
    df = spark.createDataFrame([("2024-01-02",)], "s string")
    row = df.select(
        guarded_try_cast(F.col("s"), "date").alias("d"),
        F.col("s").try_cast("date").alias("p"),
    ).collect()[0]
    assert row.d == row.p
