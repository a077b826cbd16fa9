"""Text analysis for training-data pipelines (beyond-reference scope).

Everything here is built from JVM-side ``pyspark.sql.functions`` — no
Python UDFs in the hot path — so the whole stage codegens and scales
linearly with input splits. Each function returns Columns (composable into
any pipeline) and formulas are deliberately expressible in portable SQL so
the DuckDB oracle can verify them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram heuristic language
# ID. Chosen to be disjoint, high-frequency function words.
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "und", "die", "nicht", "das"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "que", "los", "una", "por"],
}


def token_count(text: Column) -> Column:
    """Whitespace token count. size(split) on the trimmed string; empty
    string counts 0. (SQL-portable: length-difference formulation is used
    by the oracle; both agree on single-space-separated text.)"""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


# GPT-2-style pre-tokenizer, simplified to the ASCII classes that matter
# for counting: letter runs, digit runs, runs of other non-space symbols.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def token_count_bpe(text: Column) -> Column:
    """BPE-ish token count: the number of pre-tokenizer matches — the
    cheap proxy for LLM token budgeting when a real tokenizer isn't on the
    executors. Pure regexp_extract_all, JVM-side, and expressible in
    DuckDB with the same RE2-compatible pattern (oracle-verified)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0))


def char_count(text: Column) -> Column:
    return F.length(text)


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are . , ; : ! ? (simple, SQL-portable)."""
    stripped = F.regexp_replace(text, r"[.,;:!?]", "")
    return F.when(F.length(text) == 0, F.lit(0.0)).otherwise(
        (F.length(text) - F.length(stripped)) / F.length(text).cast("double")
    )


def uppercase_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, r"[A-Z]", "")
    return F.when(F.length(text) == 0, F.lit(0.0)).otherwise(
        (F.length(text) - F.length(stripped)) / F.length(text).cast("double")
    )


def digit_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, r"[0-9]", "")
    return F.when(F.length(text) == 0, F.lit(0.0)).otherwise(
        (F.length(text) - F.length(stripped)) / F.length(text).cast("double")
    )


def mean_word_length(text: Column) -> Column:
    t = F.trim(text)
    n_tokens = token_count(text)
    total = F.length(F.regexp_replace(t, r"\s+", ""))
    return F.when(n_tokens == 0, F.lit(0.0)).otherwise(
        total / n_tokens.cast("double")
    )


def quality_score(text: Column) -> Column:
    """Heuristic document quality in [0,1]: length in a sane band, low
    digit/punct noise, words of plausible length. The exact formula is a
    policy, not a truth — what matters is it's deterministic, cheap, and
    runs JVM-side."""
    n = token_count(text)
    length_ok = F.when((n >= 10) & (n <= 5000), F.lit(1.0)).otherwise(
        F.when(n == 0, F.lit(0.0)).otherwise(F.lit(0.5))
    )
    mwl = mean_word_length(text)
    word_ok = F.when((mwl >= 3.0) & (mwl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.5))
    noise = punct_ratio(text) + digit_ratio(text)
    noise_ok = F.when(noise < 0.2, F.lit(1.0)).otherwise(
        F.when(noise < 0.4, F.lit(0.5)).otherwise(F.lit(0.0))
    )
    return F.round((length_ok + word_ok + noise_ok) / F.lit(3.0), 4)


def lang_id(text: Column) -> Column:
    """Marker-word language heuristic: score each language by the number of
    its top function words present (word-boundary match on the lowercased
    text); highest score wins, ties broken by language code order, 'und'
    (undetermined) when nothing matches.

    One regex pass (r14 optimization): the 20 per-marker ``rlike`` scans
    — 20 full traversals of every document — collapse into a single
    ``regexp_extract_all`` over the 20-way marker alternation (markers
    are unique across languages by construction), and each language's
    score is the size of its intersection with the distinct markers
    found. Scores are identical: a marker contributes exactly 1 iff
    present, same as the presence-indicator sum. NULL text scores 0
    everywhere → 'und', as before (the coalesce keeps size() off its
    NULL→-1 path)."""
    lowered = F.lower(text)
    all_words = [
        w for _, ws in sorted(_LANG_MARKERS.items()) for w in ws
    ]
    present = F.coalesce(
        F.array_distinct(
            F.regexp_extract_all(
                lowered, F.lit(rf"\b({'|'.join(all_words)})\b"), 1
            )
        ),
        F.array().cast("array<string>"),
    )
    scores = []
    for lang, words in sorted(_LANG_MARKERS.items()):
        s = F.size(
            F.array_intersect(
                present, F.array(*[F.lit(w) for w in words])
            )
        )
        scores.append((lang, s))
    best_score = None
    best_lang = F.lit("und")
    # iterate in reverse so earlier languages win ties; a language must
    # score > 0 to claim the doc (all-zero → 'und')
    for lang, s in reversed(scores):
        if best_score is None:
            best_score, best_lang = s, F.when(s > 0, F.lit(lang)).otherwise(F.lit("und"))
        else:
            best_lang = F.when((s >= best_score) & (s > 0), F.lit(lang)).otherwise(best_lang)
            best_score = F.greatest(s, best_score)
    return best_lang


def fingerprint(text: Column, normalize: bool = True) -> Column:
    """Document fingerprint: 64-bit hash of the normalized text
    (lowercase, collapse whitespace). xxhash64 is Spark-native and stable
    across runs/versions — the exact-dedup and shard-assignment key."""
    t = text
    if normalize:
        t = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.xxhash64(t)


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full stats block — one projection, zero shuffles."""
    c = F.col(text_col)
    return df.withColumns(
        {
            "n_tokens": token_count(c),
            "n_chars_computed": char_count(c),
            "punct_ratio": F.round(punct_ratio(c), 6),
            "digit_ratio": F.round(digit_ratio(c), 6),
            "mean_word_len": F.round(mean_word_length(c), 4),
            "quality": quality_score(c),
            "lang_pred": lang_id(c),
            "fingerprint": fingerprint(c),
        }
    )
