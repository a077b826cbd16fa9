"""Corpus-curation operators for large-scale training-data pipelines:
repetition filters, PII redaction, eval-set decontamination, document
chunking, and weighted source mixing.

Beyond-reference scope (the reference is a file visualizer —
`/root/reference/src/duckdb-backend.ts:142-146` runs user SQL verbatim;
it ships no curation machinery). Everything here follows the same design
rules as operators/text.py: JVM-side column expressions (whole-stage
codegen, no Python in the hot path), formulas deliberately expressible in
portable SQL so the DuckDB oracle verifies values bit-for-bit, and
per-operator notes on the 100 TB shape.

Scale shapes at a glance:
- repetition metrics / PII redaction / chunking: pure narrow projections
  (explode only multiplies rows locally) — no shuffle, linear in splits.
- decontamination: the eval side of the join is *small by construction*
  (benchmarks are KBs-MBs); broadcast it and the contamination scan stays
  shuffle-free on the 100 TB side.
- weighted mixing: narrow explode by an integer repeat factor — the
  standard epoch-weighting materialization; no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vscode_parquet_visualizer_spark.operators.split import (
    BUCKETS,
    split_bucket,
)

# --------------------------------------------------------------------------
# tokenization helpers (shared convention with operators/text.py: whitespace
# tokens over the trimmed string; blank text -> empty array)


def tokens(text: Column) -> Column:
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def shingles(toks: Column, n: int) -> Column:
    """n-token shingles (n-grams as strings); docs shorter than ``n``
    yield an empty array.

    Built by zipping ``n`` shifted slices of the array and concatenating
    inside the transform lambda — the lambda touches only its own zip
    element, never the outer ``toks`` expression. The naive alternative
    (``element_at(toks, i+k)`` over a position sequence) embeds a copy of
    ``toks`` in the lambda body, and higher-order functions neither
    codegen nor CSE, so a ``split()``-backed ``toks`` would re-tokenize
    per position: O(len²) per document (measured 12 s vs ~1 s on the
    sf0.1 corpus). Here ``toks`` evaluates exactly ``n`` times (the
    slices) — O(n·len) per row, still a narrow projection."""
    m = F.size(toks) - (n - 1)
    z = F.arrays_zip(*[F.slice(toks, 1 + k, m) for k in range(n)])
    return F.when(
        F.size(toks) < n, F.array().cast("array<string>")
    ).otherwise(
        F.transform(z, lambda p: F.concat_ws(" ", *[p[str(k)] for k in range(n)]))
    )


def bigrams(toks: Column) -> Column:
    """Adjacent token pairs joined with one space (see ``shingles`` for
    why this zips slices instead of indexing with element_at)."""
    return shingles(toks, 2)


# --------------------------------------------------------------------------
# repetition metrics (Gopher-style quality signals)


def _max_group_count(arr: Column) -> Column:
    """Count of the most frequent element: sort the array, then a single
    O(n) fold finds the longest run of equal adjacent values (equal values
    are adjacent once sorted). One pass, constant state, codegen-friendly —
    the per-row analogue of a map-side combine. (The DuckDB oracle computes
    the same value the O(distinct·n) way; values match, plans differ.)"""
    s = F.array_sort(arr)
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(acc: Column, x: Column) -> Column:
        run = F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(s, init, step, lambda acc: acc["best"])


def dup_token_frac(toks: Column) -> Column:
    """1 − distinct/total: the fraction of tokens that are repeats of an
    earlier token. 0 for empty docs."""
    n = F.size(toks)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct(toks)) / n.cast("double")
    )


def top_token_frac(toks: Column) -> Column:
    """Fraction of tokens taken by the single most frequent token — high
    values mean degenerate repetition (Gopher's top-n-gram filter, n=1)."""
    n = F.size(toks)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        _max_group_count(toks) / n.cast("double")
    )


def top_bigram_frac(toks: Column) -> Column:
    """Fraction of adjacent bigrams taken by the most frequent bigram."""
    b = bigrams(toks)
    n = F.size(b)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        _max_group_count(b) / n.cast("double")
    )


def symbol_ratio(text: Column) -> Column:
    """Fraction of characters that are neither alphanumeric nor
    whitespace — high values flag markup/boilerplate debris."""
    stripped = F.regexp_replace(text, r"[A-Za-z0-9\s]", "")
    return F.when(F.length(text) == 0, F.lit(0.0)).otherwise(
        F.length(stripped) / F.length(text).cast("double")
    )


def with_repetition_metrics(
    df: DataFrame,
    text_col: str = "text",
    max_dup_token_frac: float = 0.6,
    max_top_token_frac: float = 0.3,
    max_top_bigram_frac: float = 0.2,
) -> DataFrame:
    """Append the repetition columns plus a boolean ``keep_repetition``
    verdict (thresholds follow the Gopher-rule shape). Narrow projection —
    a 100 TB scan filters in place, no shuffle."""
    t = tokens(F.col(text_col))
    d = dup_token_frac(t)
    tt = top_token_frac(t)
    tb = top_bigram_frac(t)
    return df.select(
        "*",
        F.round(d, 6).alias("dup_token_frac"),
        F.round(tt, 6).alias("top_token_frac"),
        F.round(tb, 6).alias("top_bigram_frac"),
        F.round(symbol_ratio(F.col(text_col)), 6).alias("symbol_ratio"),
        (
            (d <= max_dup_token_frac)
            & (tt <= max_top_token_frac)
            & (tb <= max_top_bigram_frac)
        ).alias("keep_repetition"),
    )


# --------------------------------------------------------------------------
# PII redaction

# Ordered: email first (its local part could otherwise be chewed up by
# later rules), then IPv4, then phone. Patterns restricted to syntax valid
# and identical in meaning under both Java regex (Spark) and RE2 (DuckDB):
# no backrefs, no lookaround.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-.]\d{3,4}\b", "<PHONE>"),
]


def redact_pii(text: Column) -> Column:
    """Replace e-mail / IPv4 / phone-shaped spans with typed placeholder
    tokens. Chained regexp_replace — JVM-side, global by default."""
    out = text
    for _name, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-category match counts (before redaction). Counted on the
    progressively-redacted text so categories don't double-count spans
    (an IP inside an e-mail host is the e-mail's, not the IP rule's)."""
    out: dict[str, Column] = {}
    cur = text
    for name, pat, repl in PII_PATTERNS:
        out[f"n_{name}"] = F.size(F.regexp_extract_all(cur, F.lit(pat), 0))
        cur = F.regexp_replace(cur, pat, repl)
    return out


# --------------------------------------------------------------------------
# decontamination (eval-set n-gram overlap)


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
    threshold: float = 0.1,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Score each training document by the fraction of its distinct
    ``ngram``-token shingles that also appear anywhere in the eval corpus
    — the standard benchmark-decontamination test (docs above
    ``threshold`` are dropped from training corpora before an eval is
    trusted).

    Scale shape: the eval side collapses to DISTINCT shingles (benchmarks
    are tiny — MBs against 100 TB of training text), broadcast to every
    executor; the train side is one explode + one broadcast left join +
    one re-group by doc id. With ``broadcast_eval`` the only shuffle is
    the final per-document count aggregation, whose key (the id) is
    unique — perfectly distributed, no skew. Docs shorter than ``ngram``
    tokens carry no shingle evidence and are omitted (both engines agree).
    """
    # Tokenize in a projection BELOW the explode: the Generate node is a
    # plan boundary CollapseProject can't cross, so split() runs once per
    # document instead of once per slice/size reference inside the
    # shingle expression.
    sh = F.explode(
        F.array_distinct(shingles(F.col("__toks"), ngram))
    ).alias("__shingle")
    ev = (
        eval_df.select(tokens(F.col(text_col)).alias("__toks"))
        .select(sh)
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    if broadcast_eval:
        ev = F.broadcast(ev)
    tr = train.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    ).select(F.col(id_col), sh)
    scored = (
        tr.join(ev, "__shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("__hit").alias("n_overlap"),
        )
    )
    score = F.col("n_overlap") / F.col("n_shingles").cast("double")
    return scored.select(
        id_col,
        "n_shingles",
        "n_overlap",
        F.round(score, 6).alias("contamination"),
        (score > threshold).alias("contaminated"),
    )


# --------------------------------------------------------------------------
# document chunking


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 50,
    stride: int = 40,
) -> DataFrame:
    """Split documents into fixed-token windows with overlap
    (``stride`` < ``chunk_tokens`` overlaps consecutive chunks — the
    standard shape for context-window training samples and retrieval
    indexing). Empty documents yield no chunks.

    Narrow: tokenize once, explode the chunk-index range, slice the token
    array per index — rows multiply ~n/stride locally, nothing shuffles.
    """
    if chunk_tokens <= 0 or stride <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    n_chunks = (
        F.when(n <= chunk_tokens, F.lit(1))
        .otherwise(F.floor((n - chunk_tokens + stride - 1) / F.lit(stride)) + 1)
        .cast("int")
    )
    base = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        n.alias("__n"),
        n_chunks.alias("__nc"),
    ).filter(F.col("__n") > 0)
    idx = F.explode(F.sequence(F.lit(0), F.col("__nc") - 1)).alias("chunk_id")
    out = base.select(F.col(id_col), "__toks", "__n", idx)
    piece = F.slice(
        F.col("__toks"), F.col("chunk_id") * stride + 1, chunk_tokens
    )
    return out.select(
        id_col,
        "chunk_id",
        F.size(piece).cast("long").alias("n_chunk_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


# --------------------------------------------------------------------------
# LM-perplexity quality scoring (CCNet-style)


def lm_perplexity(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = 0.5,
    round_digits: int = 4,
) -> DataFrame:
    """Self-supervised quality score: train an add-k-smoothed bigram LM
    on the corpus itself and score each document by its average
    per-bigram negative log2 probability (≈ log-perplexity). The CCNet
    recipe — low-perplexity ≈ fluent/common text, high ≈ noise — with
    the corpus standing in for the reference LM.

    P(w2|w1) = (c(w1 w2) + k) / (c(w1) + k·V),  V = |vocab|.

    Scale shape: two count aggregations (bigram, unigram — both
    map-side-combined on well-distributed token keys), a one-row vocab
    aggregate cross-joined (broadcast of a single row), and two
    equi-joins from bigram instances to their counts. Everything
    shuffles on token/bigram keys — no all-pairs, no driver loops; at
    100 TB the LM tables are themselves distributed (no broadcast of
    the counts). Docs with <2 tokens have no bigram evidence and are
    omitted (the oracle agrees).
    """
    tok = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
    inst = tok.select(
        F.col(id_col), F.explode(bigrams(F.col("__toks"))).alias("__bg")
    ).withColumn("__w1", F.split(F.col("__bg"), " ")[0])
    bg_counts = inst.groupBy("__bg").agg(F.count(F.lit(1)).alias("__cbg"))
    uni = tok.select(F.explode(F.col("__toks")).alias("__w")).groupBy(
        "__w"
    ).agg(F.count(F.lit(1)).alias("__cw"))
    vocab = uni.agg(F.count(F.lit(1)).alias("__v"))
    p = (F.col("__cbg") + F.lit(k)) / (
        F.col("__cw") + F.lit(k) * F.col("__v")
    )
    scored = (
        inst.join(bg_counts, "__bg")
        .join(uni.withColumnRenamed("__w", "__w1"), "__w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn("__nll", -F.log2(p))
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("__nll"), round_digits).alias("avg_nll"),
        )
        .select(
            id_col,
            F.col("n_bigrams").cast("bigint").alias("n_bigrams"),
            "avg_nll",
        )
    )


# --------------------------------------------------------------------------
# weighted source mixing


def weighted_mix(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    weights: dict[str, float],
    salt: str = "mix",
    copy_col: str = "copy_id",
) -> DataFrame:
    """Materialize an epoch-weighted mixture: each row of stratum ``s``
    appears ``floor(w_s)`` times plus one more with probability
    ``frac(w_s)`` — decided by the same deterministic md5 bucket as
    operators/split.py, so the mixture is stable under re-runs, appends,
    and engine choice (the DuckDB oracle materializes the identical set).
    Strata absent from ``weights`` get weight 0 (dropped) — mixing is
    also how sources get excluded.

    Scale shape: a literal map lookup + integer explode — narrow, no
    shuffle, no join; output size is exactly sum(w_s·|s|) rows.
    """
    floor_pairs: list = []
    frac_pairs: list = []
    for value, w in weights.items():
        if w < 0:
            raise ValueError(f"weight for {value!r} must be >= 0")
        floor_pairs.extend([F.lit(value), F.lit(int(w))])
        frac_pairs.extend(
            [F.lit(value), F.lit(int(round((w - int(w)) * BUCKETS)))]
        )
    floors = F.create_map(*floor_pairs)[F.col(strata_col)]
    fracs = F.create_map(*frac_pairs)[F.col(strata_col)]
    extra = F.when(
        split_bucket(F.col(key_col), salt) < fracs, F.lit(1)
    ).otherwise(F.lit(0))
    copies = (F.coalesce(floors, F.lit(0)) + F.coalesce(extra, F.lit(0))).cast(
        "int"
    )
    reps = F.when(copies >= 1, F.sequence(F.lit(1), copies)).otherwise(
        F.array().cast("array<int>")
    )
    return df.withColumn(copy_col, F.explode(reps))
