"""Text analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting. All pure
Column expressions (JVM, codegen'd) — no Python in the path — so the
same definitions serve as their own ANSI-SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword marker sets for the n-gram/stopword
# heuristic language ID (documents.lang domain: en/es/de/fr/zh/...)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
}

EN_STOPWORDS = [
    "the", "and", "of", "to", "a", "in", "is", "it", "that", "for",
    "on", "with", "as", "at", "by", "an", "be", "this", "are", "or",
]


def token_count(text: Column) -> Column:
    """Whitespace token count (the BPE-ish regex variant splits on
    word boundaries + punctuation)."""
    return F.size(F.split(F.trim(text), r"\s+"))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish counting: words + digits + punctuation runs, the
    usual cheap proxy for BPE token counts."""
    return F.size(
        F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"), 0)
    )


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not alphanumeric or space —
    deliberately the simplest portable definition (same regex runs in
    any SQL engine)."""
    stripped = F.regexp_replace(text, r"[a-zA-Z0-9 ]", "")
    return F.when(F.length(text) > 0, F.length(stripped) / F.length(text)).otherwise(
        F.lit(0.0)
    )


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    sw = F.array(*[F.lit(w) for w in (stopwords or EN_STOPWORDS)])
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) > 0, n_sw / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + low punct +
    reasonable mean word length. Deterministic, SQL-expressible."""
    n_tok = token_count(text)
    mean_wl = F.when(n_tok > 0, F.length(F.regexp_replace(text, r"\s+", "")) / n_tok).otherwise(F.lit(0.0))
    len_ok = F.when((n_tok >= 5) & (n_tok <= 5000), F.lit(1.0)).otherwise(F.lit(0.3))
    punct_ok = F.when(punct_ratio(text) < 0.2, F.lit(1.0)).otherwise(F.lit(0.4))
    wl_ok = F.when((mean_wl >= 2.0) & (mean_wl <= 12.0), F.lit(1.0)).otherwise(
        F.lit(0.5)
    )
    return F.round((len_ok + punct_ok + wl_ok) / F.lit(3.0), 6)


def language_id(text: Column) -> Column:
    """Stopword-marker language ID: the language whose marker set hits
    the most tokens; 'und' (undetermined) when nothing hits."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    scores = []
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        scores.append(
            F.struct(
                F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).alias(
                    "hits"
                ),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*scores))
    return F.when(best.getField("hits") > 0, best.getField("lang")).otherwise(
        F.lit("und")
    )


def doc_fingerprint(text: Column, mod: int = 1_000_003) -> Column:
    """Order-sensitive polynomial rolling hash over token lengths+first
    chars: fold h = (h*31 + code) % mod, JVM-side F.aggregate. Cheap
    content fingerprint whose SQL translation (list_reduce) matches
    exactly (values stay < 2^63 at every step)."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    codes = F.transform(
        toks, lambda t: (F.length(t) * F.lit(131) + F.ascii(t)).cast("long")
    )
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(31) + c) % F.lit(mod),
    )


def text_profile(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per doc with the full analysis column set.

    r6 (guide §1.2 per-task work): the standalone helpers each embed
    their own split/regexp over the text, so composing them in one
    select re-ran the whitespace split ~8x and the punct regex 2x per
    row (Catalyst re-evaluates inline expression trees at every
    reference). The shared subexpressions are projected ONCE here
    under names — a multi-referenced non-cheap alias is kept by
    CollapseProject — and every output is the same expression over the
    named columns, so values are identical (pinned by the text_profile
    oracle, which recomputes everything from scratch in SQL). The
    helpers above stay as the single-metric public API."""
    t = F.col(text_col)
    pre = docs.select(
        F.col(id_col).alias("doc_id"),
        t.alias("_t"),
        F.split(F.trim(t), r"\s+").alias("_wtoks"),
        F.split(F.lower(F.trim(t)), r"\s+").alias("_ltoks"),
        F.regexp_replace(t, r"[a-zA-Z0-9 ]", "").alias("_stripped"),
    )
    tt = F.col("_t")
    wtoks = F.col("_wtoks")
    ltoks = F.col("_ltoks")
    n_tok = F.size(wtoks)
    p_ratio = F.when(
        F.length(tt) > 0, F.length(F.col("_stripped")) / F.length(tt)
    ).otherwise(F.lit(0.0))
    sw = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n_sw = F.size(F.filter(ltoks, lambda x: F.array_contains(sw, x)))
    mean_wl = F.when(
        n_tok > 0, F.length(F.regexp_replace(tt, r"\s+", "")) / n_tok
    ).otherwise(F.lit(0.0))
    len_ok = F.when((n_tok >= 5) & (n_tok <= 5000), F.lit(1.0)).otherwise(F.lit(0.3))
    punct_ok = F.when(p_ratio < 0.2, F.lit(1.0)).otherwise(F.lit(0.4))
    wl_ok = F.when((mean_wl >= 2.0) & (mean_wl <= 12.0), F.lit(1.0)).otherwise(
        F.lit(0.5)
    )
    scores = []
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        scores.append(
            F.struct(
                F.size(F.filter(ltoks, lambda x: F.array_contains(arr, x))).alias(
                    "hits"
                ),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*scores))
    codes = F.transform(
        ltoks, lambda x: (F.length(x) * F.lit(131) + F.ascii(x)).cast("long")
    )
    fingerprint = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(31) + c) % F.lit(1_000_003),
    )
    return pre.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        bpe_ish_token_count(tt).cast("long").alias("n_bpe_tokens"),
        F.round(p_ratio, 6).alias("punct_ratio"),
        F.round(
            F.when(F.size(ltoks) > 0, n_sw / F.size(ltoks)).otherwise(F.lit(0.0)), 6
        ).alias("stopword_ratio"),
        F.round((len_ok + punct_ok + wl_ok) / F.lit(3.0), 6).alias("quality"),
        F.when(best.getField("hits") > 0, best.getField("lang"))
        .otherwise(F.lit("und"))
        .alias("pred_lang"),
        fingerprint.alias("fingerprint"),
    )
