"""As-of join semantics: vs hand-computed truth and vs pandas merge_asof."""

import pandas as pd
import pytest

from vscode_parquet_visualizer_spark.operators.asof import (
    asof_join,
    asof_join_pandas,
)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 7, "d"), (3, 1, "e")],
        ["k", "t", "payload"],
    )
    right = spark.createDataFrame(
        [(1, 8, 100.0), (1, 15, 200.0), (2, 7, 300.0), (4, 1, 400.0)],
        ["k", "t", "price"],
    )
    return left, right


def test_backward(frames):
    left, right = frames
    out = asof_join(left, right, on="t", by=["k"]).collect()
    got = {(r["k"], r["t"]): r["price"] for r in out}
    assert got == {
        (1, 10): 100.0,   # latest right.t <= 10 is 8
        (1, 20): 200.0,   # 15
        (1, 5): None,     # nothing at or before 5
        (2, 7): 300.0,    # tie: <= matches equal timestamps
        (3, 1): None,     # key has no right rows
    }


def test_forward(frames):
    left, right = frames
    out = asof_join(left, right, on="t", by=["k"], direction="forward").collect()
    got = {(r["k"], r["t"]): r["price"] for r in out}
    assert got[(1, 10)] == 200.0  # earliest right.t >= 10 is 15
    assert got[(1, 20)] is None
    assert got[(1, 5)] == 100.0


def test_row_count_preserved(frames):
    left, right = frames
    assert asof_join(left, right, on="t", by=["k"]).count() == left.count()


def test_strict_backward(frames):
    """Strict (``>``) excludes equal timestamps: (2,7) no longer matches
    the right row at t=7; everything else is unchanged."""
    left, right = frames
    out = asof_join(left, right, on="t", by=["k"], strict=True).collect()
    got = {(r["k"], r["t"]): r["price"] for r in out}
    assert got == {
        (1, 10): 100.0,
        (1, 20): 200.0,
        (1, 5): None,
        (2, 7): None,    # tie excluded under strict
        (3, 1): None,
    }


def test_strict_forward(frames):
    left, right = frames
    out = asof_join(
        left, right, on="t", by=["k"], direction="forward", strict=True
    ).collect()
    got = {(r["k"], r["t"]): r["price"] for r in out}
    assert got[(2, 7)] is None  # tie excluded
    assert got[(1, 10)] == 200.0
    assert got[(1, 5)] == 100.0


def test_strict_matches_pandas(frames):
    left, right = frames
    got = {
        (r["k"], r["t"]): r["price"]
        for r in asof_join(left, right, on="t", by=["k"], strict=True).collect()
    }
    lp = left.toPandas().sort_values("t")
    rp = right.toPandas().sort_values("t")
    want_df = pd.merge_asof(
        lp, rp, on="t", by="k", direction="backward", allow_exact_matches=False
    )
    want = {
        (r.k, r.t): (None if pd.isna(r.price) else r.price)
        for r in want_df.itertuples()
    }
    assert got == want


def test_strict_nearest_rejected(frames):
    left, right = frames
    with pytest.raises(ValueError, match="strict"):
        asof_join(left, right, on="t", by=["k"], direction="nearest", strict=True)


def test_strict_asof_sql_matches_duckdb(spark, sf_dir):
    """The ``ASOF JOIN ... ON a.ms > b.ms`` SQL surface routes through the
    strict window plan and matches DuckDB running the identical text."""
    import duckdb

    from vscode_parquet_visualizer_spark.plans import dialect
    from vscode_parquet_visualizer_spark.plans.asof_sql import try_rewrite_asof
    from vscode_parquet_visualizer_spark.workload import load_tables

    t = load_tables(spark, sf_dir)
    from pyspark.sql import functions as F

    t["events"].filter(F.col("event_type") == "purchase").createOrReplaceTempView("sp")
    t["events"].filter(F.col("event_type") == "view").createOrReplaceTempView("sv")
    sql = """
        SELECT p.event_id, v.event_id AS view_id
        FROM sp p ASOF LEFT JOIN sv v
          ON p.user_id = v.user_id AND p.ts > v.ts
    """
    routed = try_rewrite_asof(spark, sql)
    assert routed is not None
    got = {
        (r["event_id"], r["view_id"])
        for r in spark.sql(dialect.transpile(routed)).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW sp AS SELECT * FROM '{sf_dir}/events.parquet' WHERE event_type = 'purchase'"
    )
    con.execute(
        f"CREATE VIEW sv AS SELECT * FROM '{sf_dir}/events.parquet' WHERE event_type = 'view'"
    )
    want = set(map(tuple, con.execute(sql).fetchall()))
    assert got == want


def test_matches_pandas_merge_asof(spark, sf_dir):
    from pyspark.sql import functions as F

    from vscode_parquet_visualizer_spark.sources import registry

    ev = registry.read(spark, f"{sf_dir}/events.parquet", "parquet")

    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", F.unix_micros("ts").alias("t"), "value"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("vid"), F.unix_micros("ts").alias("t")
    )
    got = (
        asof_join(purchases, views, on="t", by=["user_id"])
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    lp = purchases.toPandas().sort_values("t")
    rp = views.toPandas().sort_values("t")
    want = pd.merge_asof(lp, rp, on="t", by="user_id", direction="backward")
    want = want.sort_values("event_id").reset_index(drop=True)
    assert got["vid"].fillna(-1).tolist() == want["vid"].fillna(-1).tolist()


def test_pandas_variant_matches_native(frames):
    left, right = frames
    native = {
        (r["k"], r["t"]): r["price"]
        for r in asof_join(left, right, on="t", by=["k"]).collect()
    }
    pandas_out = {
        (r["k"], r["t"]): r["price"]
        for r in asof_join_pandas(left, right, on="t", by=["k"]).collect()
    }
    assert native == pandas_out


def test_nearest(frames):
    left, right = frames
    out = asof_join(left, right, on="t", by=["k"], direction="nearest").collect()
    got = {(r["k"], r["t"]): r["price"] for r in out}
    # k=1,t=10: backward 8 (d=2) vs forward 15 (d=5) -> 100.0
    assert got[(1, 10)] == 100.0
    # k=1,t=5: backward none, forward 8 -> 100.0
    assert got[(1, 5)] == 100.0
    # k=1,t=20: backward 15 (d=5), no forward -> 200.0
    assert got[(1, 20)] == 200.0
    # exact tie at equal distance prefers backward
    assert got[(2, 7)] == 300.0


def test_nearest_matches_pandas(spark, frames):
    import pandas as pd

    left, right = frames
    got = (
        asof_join(left, right, on="t", by=["k"], direction="nearest")
        .toPandas().sort_values(["k", "t"]).reset_index(drop=True)
    )
    lp = left.toPandas().sort_values("t")
    rp = right.toPandas().sort_values("t")
    want = (
        pd.merge_asof(lp, rp, on="t", by="k", direction="nearest")
        .sort_values(["k", "t"]).reset_index(drop=True)
    )
    assert got["price"].fillna(-1).tolist() == want["price"].fillna(-1).tolist()


def test_asof_sql_routing(spark, sf_dir):
    """DuckDB ASOF JOIN SQL parses, routes through asof_join, and splices
    alias-qualified references onto the result view."""
    from vscode_parquet_visualizer_spark.plans import dialect
    from vscode_parquet_visualizer_spark.plans.asof_sql import try_rewrite_asof
    from vscode_parquet_visualizer_spark.sources import registry

    ev = registry.read(spark, f"{sf_dir}/events.parquet", "parquet")
    ev.filter("event_type = 'purchase'").createOrReplaceTempView("p_t")
    ev.filter("event_type = 'view'").createOrReplaceTempView("v_t")
    routed = try_rewrite_asof(
        spark,
        "SELECT p.event_id, v.ts FROM p_t p ASOF JOIN v_t v "
        "ON p.user_id = v.user_id AND p.ts >= v.ts",
    )
    assert routed is not None and "ASOF" not in routed.upper()
    out = spark.sql(dialect.transpile(routed))
    rows = out.collect()
    assert len(rows) > 0
    # inner semantics: every returned purchase has a matched view ts
    assert all(r[1] is not None for r in rows)

    # LEFT ASOF keeps unmatched purchases with null match
    routed_left = try_rewrite_asof(
        spark,
        "SELECT p.event_id, v.ts FROM p_t p ASOF LEFT JOIN v_t v "
        "ON p.user_id = v.user_id AND p.ts >= v.ts",
    )
    n_left = spark.sql(dialect.transpile(routed_left)).count()
    n_purchases = spark.table("p_t").count()
    assert n_left == n_purchases

    # strict inequality routes too (ties excluded — see
    # test_strict_asof_sql_matches_duckdb for the value gate)
    routed_strict = try_rewrite_asof(
        spark,
        "SELECT p.event_id FROM p_t p ASOF JOIN v_t v "
        "ON p.user_id = v.user_id AND p.ts > v.ts",
    )
    assert routed_strict is not None and "ASOF" not in routed_strict.upper()


def test_asof_sql_through_engine(spark, sf_dir):
    from vscode_parquet_visualizer_spark.engine import Engine
    from vscode_parquet_visualizer_spark.sources import registry

    registry.read(spark, f"{sf_dir}/events.parquet", "parquet").filter(
        "event_type = 'view'"
    ).createOrReplaceTempView("view_events")
    eng = Engine(spark=spark)
    ds = eng.open(f"{sf_dir}/events.parquet")
    rs = ds.query(
        "SELECT d.event_id, v.ts FROM data d ASOF JOIN view_events v "
        "ON d.user_id = v.user_id AND d.ts >= v.ts WHERE d.event_type = 'purchase'"
    )
    assert rs.row_count > 0


def test_positional_join_sql(spark, sf_dir):
    """POSITIONAL JOIN zips by scan order, null-padding the longer side."""
    from vscode_parquet_visualizer_spark.plans import dialect
    from vscode_parquet_visualizer_spark.plans.asof_sql import (
        try_rewrite_positional,
    )
    from vscode_parquet_visualizer_spark.sources import registry

    registry.read(spark, f"{sf_dir}/nation.parquet", "parquet").createOrReplaceTempView("nation")
    registry.read(spark, f"{sf_dir}/region.parquet", "parquet").createOrReplaceTempView("region")
    routed = try_rewrite_positional(
        spark, "SELECT n.n_name, r.r_name FROM nation n POSITIONAL JOIN region r"
    )
    rows = spark.sql(dialect.transpile(routed)).collect()
    assert len(rows) == 25  # longer side wins
    assert sum(1 for r in rows if r["r_name"] is not None) == 5


def test_asof_rewrite_literal_and_subquery_guards(spark):
    from vscode_parquet_visualizer_spark.plans.asof_sql import (
        try_rewrite_asof,
        try_rewrite_positional,
    )

    # join-like text inside a string literal: not a join — no rewrite
    assert (
        try_rewrite_asof(spark, "SELECT 'a ASOF JOIN b ON x' AS s FROM t")
        is None
    )
    assert (
        try_rewrite_positional(
            spark, "SELECT 'x POSITIONAL JOIN y' AS s FROM t"
        )
        is None
    )
    # ASOF inside a subquery: unsupported shape — decline (loud parse
    # error upstream) rather than splicing the outer query wrongly
    assert (
        try_rewrite_asof(
            spark,
            "SELECT * FROM (SELECT a.x FROM ta a ASOF JOIN tb b "
            "ON a.k = b.k AND a.t >= b.t) s",
        )
        is None
    )
    # a string literal elsewhere in a routed query survives verbatim
    import pyspark.sql.functions as SF

    spark.range(3).select(
        SF.col("id"), SF.lit(5).alias("t")
    ).createOrReplaceTempView("lit_a")
    spark.range(2).select(
        SF.col("id"), SF.lit(3).alias("t")
    ).createOrReplaceTempView("lit_b")
    routed = try_rewrite_asof(
        spark,
        "SELECT a.id, 'tag -> ok' AS tag FROM lit_a a ASOF JOIN lit_b b "
        "ON a.id = b.id AND a.t >= b.t",
    )
    assert routed is not None and "'tag -> ok'" in routed


def test_positional_join_stays_jvm_side(spark, sf_dir):
    """The position key is built JVM-side: no Python RDD round-trip
    (df.rdd would deserialize every row into Python and back — a
    scale-killer on both relations)."""
    from vscode_parquet_visualizer_spark.operators.positional import (
        positional_join,
    )

    left = spark.read.parquet(f"{sf_dir}/nation.parquet")
    right = spark.read.parquet(f"{sf_dir}/region.parquet")
    out = positional_join(left, right)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # localCheckpoint legitimately shows as a JVM ExistingRDD scan; what
    # must NOT appear is any Python evaluation/serialization node
    assert "PythonRDD" not in plan
    assert "EvalPython" not in plan
    assert "Scan ExistingRDD[__pos" not in plan  # the old rdd.zipWithIndex shape
    # zip order matches scan order on both sides
    rows = out.collect()
    want_left = [r["n_name"] for r in left.collect()]
    assert [r["n_name"] for r in rows] == want_left
    want_right = [r["r_name"] for r in right.collect()]
    assert [r["r_name"] for r in rows][: len(want_right)] == want_right
