"""Round-11 composite differential fuzz (r10 verdict item 6): mix the
STATEMENT grammar (CTAS / INSERT / UPDATE / DELETE / sequences /
macros), the EXPRESSION grammar (test_properties generators), the
LITERAL encodings (plain / e-string / dollar-quote), and the quoted
IDENTIFIER grammar inside single multi-statement scripts, executed by
run_sql (whole script) vs DuckDB (statement by statement); the final
SELECT's column names and normalized rows must match.

Usage: python tools/composite_fuzz.py N_SCRIPTS SEED
"""

import os
import random
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import duckdb
import test_properties as tp

IDENTS = [
    "a", "v2", "x y", "0!", 'sel"ect', "ORDER", "l$x", "From",
    "ümlaut", "c,d", "a.b", "odd'name",
]
LIT_STRS = ["a", "it's", "x$y", "A b", "", "tab\tchar", "q''q", "中€"]


def qid(name: str) -> str:
    return '"' + name.replace('"', '""') + '"'


def gen_script(rng: random.Random, k: int):
    tbl = f"fz{k}"
    id1, id2 = rng.sample(IDENTS, 2)
    stmts = []
    n0 = rng.randrange(2, 5)
    stmts.append(
        f"CREATE OR REPLACE TABLE {tbl} AS SELECT "
        f"{tp._gen_num(rng, 2)} + range AS {qid(id1)}, "
        f"{tp._gen_str(rng, 2)} AS {qid(id2)}, "
        f"range AS rid FROM range({n0})"
    )
    use_seq = rng.random() < 0.25
    if use_seq:
        stmts.append(f"CREATE OR REPLACE SEQUENCE fzs{k} START {rng.randrange(1, 5)}")
    use_macro = rng.random() < 0.25
    if use_macro:
        stmts.append(
            f"CREATE OR REPLACE MACRO fzm{k}(p) AS p + {rng.randrange(1, 9)}"
        )
    for i in range(rng.randrange(0, 3)):
        s = rng.choice(LIT_STRS)
        lit = tp._encode(s, rng.randrange(3))
        stmts.append(
            f"INSERT INTO {tbl} VALUES "
            f"({rng.randrange(-5, 50)}, {lit}, {100 + i})"
        )
    if rng.random() < 0.5:
        if rng.random() < 0.5:
            stmts.append(
                f"UPDATE {tbl} SET {qid(id1)} = {qid(id1)} * 2 + 1 "
                f"WHERE rid % {rng.randrange(2, 4)} = 0"
            )
        else:
            fn = rng.choice(["upper", "reverse", "trim"])
            stmts.append(
                f"UPDATE {tbl} SET {qid(id2)} = {fn}({qid(id2)}) "
                f"WHERE rid >= {rng.randrange(0, 3)}"
            )
    if rng.random() < 0.35:
        stmts.append(f"DELETE FROM {tbl} WHERE rid % 5 = 4")
    if rng.random() < 0.25:
        stmts.append(
            f"ALTER TABLE {tbl} ADD COLUMN ac{k} INTEGER"
        )
        stmts.append(f"UPDATE {tbl} SET ac{k} = rid * 3")
    src = tbl
    if rng.random() < 0.3:
        stmts.append(
            f"CREATE OR REPLACE VIEW fzv{k} AS SELECT *, "
            f"{qid(id1)} * 2 AS dbl FROM {tbl} WHERE rid < 110"
        )
        src = f"fzv{k}"
    sel_items = [f"{qid(id1)} AS n", f"length({qid(id2)}) AS ln",
                 f"{qid(id2)} AS s", "rid"]
    if rng.random() < 0.35:
        frac = rng.choice(["2.5", "-2.5", "0.5", "3.7"])
        wfn = rng.choice(
            [f"sum({qid(id1)}) OVER (ORDER BY rid)",
             "row_number() OVER (ORDER BY rid)",
             f"lag({qid(id2)}, 1) OVER (ORDER BY rid)",
             # fractional default over an INTEGRAL column: DuckDB
             # rounds the decimal literal half away from zero, Spark
             # would truncate — the r14 gateway rewrite closes it
             f"lag({qid(id1)}, 1, {frac}) OVER (ORDER BY rid)",
             f"lead(rid, 2, {frac}) OVER (ORDER BY rid)",
             f"count(*) OVER (PARTITION BY rid % 2 ORDER BY rid)"]
        )
        sel_items.append(f"{wfn} AS w")
    if rng.random() < 0.25:
        sel_items.append(
            f"(SELECT max(rid) FROM {src}) AS mx"
        )
    if rng.random() < 0.5:
        sel_items.append(f"{tp._gen_expr(rng, 2)} AS e")
    if rng.random() < 0.35:
        # r14: TIME-typed expressions (Spark 4.1 TimeType surface) —
        # literals, make_time, ::TIME casts, extract, + INTERVAL
        sel_items.append(rng.choice([
            "make_time((rid % 24)::INT, (rid % 60)::INT, 1.5)",
            "TIME '08:30:15'",
            f"TIME '01:02:03' + INTERVAL ({rng.randrange(1, 50)} * rid % 120) MINUTE",
            "'12:34:56.789'::TIME",
            "extract(minute FROM make_time(3, (rid % 60)::INT, 0.5))",
        ]) + " AS tc")
    if use_macro:
        sel_items.append(f"fzm{k}(rid) AS mm")
    if use_seq:
        sel_items.append(f"(SELECT {k} WHERE false) IS NULL AS sq")
    if rng.random() < 0.2:
        members = rng.sample(["zz", "mm", "aa", "kk", "bb"], 3)
        mlist = ", ".join(f"'{m}'" for m in members)
        stmts.append(f"CREATE TYPE fze{k} AS ENUM ({mlist})")
        sel_items.append(f"'{members[1]}'::fze{k} AS ec")
        sel_items.append(
            f"'{members[0]}'::fze{k} < '{members[2]}'::fze{k} AS ecmp"
        )
    where = ""
    if rng.random() < 0.4:
        where = f" WHERE rid <= {rng.randrange(1, 120)}"
    final = (
        f"SELECT {', '.join(sel_items)} FROM {src}{where} ORDER BY rid"
    )
    pick = rng.random()
    if pick < 0.15:
        # PREPARE/EXECUTE the final select with a bound parameter
        bound = rng.randrange(1, 120)
        stmts.append(
            f"PREPARE fzp{k} AS SELECT {', '.join(sel_items)} "
            f"FROM {src} WHERE rid <= ? ORDER BY rid"
        )
        stmts.append(f"EXECUTE fzp{k}({bound})")
    elif pick < 0.3:
        # set-operation final over the mutated relation
        op = rng.choice(["UNION ALL", "UNION"])
        stmts.append(
            f"SELECT {', '.join(sel_items)} FROM {src} "
            f"WHERE rid % 2 = 0 {op} "
            f"SELECT {', '.join(sel_items)} FROM {src} "
            f"WHERE rid % 2 = 1 ORDER BY rid"
        )
    else:
        stmts.append(final)
    return stmts


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    from vscode_parquet_visualizer_spark.plans.sql_gateway import run_sql
    from vscode_parquet_visualizer_spark.session import get_spark

    spark = get_spark(shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")
    rng = random.Random(seed)
    bad = duck_invalid = 0
    for k in range(n):
        stmts = gen_script(rng, k)
        script = ";\n".join(stmts)
        con = duckdb.connect()
        try:
            cur = None
            for s in stmts:
                cur = con.execute(s)
            want_rows = cur.fetchall()
            want_cols = [d[0] for d in cur.description]
        except Exception:
            duck_invalid += 1
            continue  # only DuckDB-valid scripts count
        try:
            df = run_sql(spark, script)
            got_cols = df.columns
            got_rows = [tuple(r) for r in df.collect()]
        except Exception as exc:
            bad += 1
            print(f"[{k}] SPARK ERROR: {str(exc)[:200]}\n{script}\n")
            continue
        w = [tuple(tp._fuzz_norm(v) for v in r) for r in want_rows]
        g = [tuple(tp._fuzz_norm(v) for v in r) for r in got_rows]
        if got_cols != want_cols or g != w:
            bad += 1
            print(
                f"[{k}] MISMATCH\ncols {got_cols} vs {want_cols}\n"
                f"rows {g[:6]} vs {w[:6]}\n{script}\n"
            )
    print(
        f"done: {n} scripts, {duck_invalid} duck-invalid skipped, "
        f"{bad} divergences"
    )


if __name__ == "__main__":
    main()
