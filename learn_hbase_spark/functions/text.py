"""Text-analysis functions for the training-data pipeline (north-star M4).

All deterministic, built-in-function compositions (JVM-side) so each has an
exact DuckDB-oracle equivalent. At 100 TB these run as one codegen'd map
stage over the documents scan — no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny embedded stopword lists for n-gram/stopword-ratio language ID. A real
# deployment plugs in fastText/CLD3 via a Pandas UDF; the heuristic keeps
# this container dependency-free while exercising the same plumbing.
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "de", "que", "pour"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "de", "que", "por"],
}


def tokens(col: Column) -> Column:
    """Whitespace tokenization of trimmed text → array<string>."""
    return F.split(F.trim(col), r"\s+")


def token_count(col: Column) -> Column:
    """Whitespace token count; 0 for empty/blank text."""
    return F.when(F.trim(col) == "", 0).otherwise(F.size(tokens(col)))


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish subword proxy: count of word/number/punctuation units via the
    common GPT-2-style pre-tokenizer classes (letters runs, digit runs,
    single punctuation). Cheap upper-bound estimator for token budgeting."""
    units = F.regexp_extract_all(col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    return F.size(units)


def char_count(col: Column) -> Column:
    return F.length(col)


def punct_ratio(col: Column) -> Column:
    """Fraction of non-alphanumeric, non-space chars. 0.0 for empty text."""
    punct = F.length(F.regexp_replace(col, r"[A-Za-z0-9\s]", ""))
    return F.when(F.length(col) == 0, 0.0).otherwise(
        punct.cast("double") / F.length(col)
    )


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords for `lang`. 0.0 for blank."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    toks = tokens(F.lower(col))
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.trim(col) == "", 0.0).otherwise(
        hits.cast("double") / F.size(toks)
    )


def quality_score(col: Column) -> Column:
    """Composite quality score in [0,1]: length band + low punctuation +
    stopword presence. The exact C4/Gopher-style rules vary per deployment;
    this pins a deterministic, oracle-checkable instance of the pattern."""
    n_tok = token_count(col).cast("double")
    length_ok = F.when((n_tok >= 10) & (n_tok <= 1000), 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio(col) <= 0.2, 1.0).otherwise(0.0)
    stop_ok = F.when(stopword_ratio(col) >= 0.05, 1.0).otherwise(0.0)
    return F.round((length_ok + punct_ok + stop_ok) / 3.0, 6)


def language_id(col: Column) -> Column:
    """Heuristic language ID: argmax stopword-hit-rate across languages;
    'und' (undetermined) when no stopword hits at all."""
    toks = tokens(F.lower(col))
    scores = []
    for lang, words in STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        scores.append(
            F.struct(
                F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    # array_max on struct(hits, lang): max hits, ties → lexicographically
    # greatest lang. Deterministic; matched by the oracle.
    best = F.array_max(F.array(*scores))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def repetition_from_words(words: Column, n: int = 2) -> Column:
    """Repetition score over an already-materialized word array — pass an
    *attribute* (aliased column), not a raw split expression: expressions
    inside the n-gram lambda are re-evaluated per gram (no CSE across HOF
    iterations), so feeding a split here costs O(words²) string splitting."""
    total = F.size(words) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(total, F.lit(1))),
        lambda i: F.array_join(F.slice(words, i, n), " "),
    )
    return F.when(total < 1, 0.0).otherwise(
        F.lit(1.0) - F.size(F.array_distinct(grams)).cast("double") / total
    )


def repetition_score(col: Column, n: int = 2) -> Column:
    """Gopher-style repetition signal: the fraction of word n-grams that are
    duplicates of an earlier n-gram (``1 - distinct/total``). 0.0 for texts
    with fewer than n tokens. Convenience form over raw text — hot paths
    should materialize the word array in its own projection first and call
    :func:`repetition_from_words` (see that docstring for why)."""
    words = F.split(F.trim(F.regexp_replace(F.lower(col), r"\s+", " ")), " ")
    return repetition_from_words(words, n)


EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\- ]{6,}[0-9]"


def redact_pii(col: Column) -> Column:
    """Scrub email addresses and phone-like digit runs, replacing them with
    typed placeholders. Patterns stick to syntax shared by Java regex and
    RE2 so oracles can replay them; emails are scrubbed first so their
    digits can't be re-matched as phones."""
    no_email = F.regexp_replace(col, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(no_email, PHONE_RE, "<PHONE>")


def pii_counts(col: Column) -> tuple[Column, Column]:
    """(email_count, phone_count) found in the text, for audit metrics."""
    return (
        F.regexp_count(col, F.lit(EMAIL_RE)),
        F.regexp_count(F.regexp_replace(col, EMAIL_RE, "<EMAIL>"), F.lit(PHONE_RE)),
    )


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of normalized text (lowercase, collapsed
    whitespace). Stable across engines — DuckDB md5 produces the same hex."""
    normalized = F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))
    return F.md5(normalized)


def rolling_hash(col: Column, base: int = 131, mod: int = 2147483647) -> Column:
    """Polynomial rolling hash over the character stream (Rabin-Karp style):
    ``h = fold(chars, 0, (acc, c) -> (acc*base + code(c)) % mod)``.

    Runs as one JVM fold expression per row — no shuffle, no Python. The
    modulus keeps every intermediate < 2^38 so ANSI mode never overflows;
    DuckDB reproduces it exactly with list_reduce (same base/mod).
    """
    codes = F.transform(F.split(col, ""), lambda c: F.ascii(c).cast("long"))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * base + x) % mod,
    )


# The Gopher rule-set's stopword list (Rae et al. 2021, §A1.1): a document
# must contain at least `min_stopwords` DISTINCT words from this list.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopwords: int = 2,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """The Gopher rule-based quality filter (Rae et al. 2021 §A1.1 — the
    rule set MassiveWeb/Gopher applied before any model-based scoring,
    reused by RedPajama-v2 and FineWeb as "gopher rules"): per document,
    the seven published rules as explicit metrics + per-rule booleans +
    the overall ``pass`` conjunction, so the same output serves filtering
    (``filter("pass")``) and drop-reason audits. Defaults are the paper's
    thresholds; every one is a parameter because the published values
    assume web pages (50+ words, bulleted boilerplate), not short-form
    corpora.

    Rules: word count in [min,max]; mean word length in [min,max];
    symbol-to-word ratio ('#' or '...') <= max; fraction of lines
    starting with a bullet <= max; fraction of lines ending in an
    ellipsis <= max; fraction of words containing an alphabetic char >=
    min; >= ``min_stopwords`` DISTINCT Gopher stopwords present.

    Scale: ONE codegen'd map stage over the scan — word/line arrays are
    materialized once per row as projection attributes (the
    :func:`repetition_from_words` lesson: lambdas re-evaluate argument
    expressions per element), metrics are JVM fold/filter expressions,
    and no shuffle or Python appears anywhere. Float metrics are rounded
    to 6 BEFORE threshold comparison so an external engine makes
    identical pass/fail calls. Booleans for degenerate inputs (0 words,
    0 lines) fail the word-count rule and pass the ratio rules (0-valued
    numerators), matching the oracle's coalesce conventions.

    ``passthrough`` columns ride along unchanged — still ONE projection,
    no join — so a pipeline (``pipeline.curation.curate``) can gate on
    ``pass`` and keep its working columns without a doc_id self-join.
    """
    t = F.col(text_col)
    base = df.select(
        F.col(id_col),
        *passthrough,
        t.alias("_t"),
        F.filter(F.split(t, r"\s+"), lambda w: w != "").alias("_w"),
        F.split(t, "\n").alias("_l"),
    )
    nw = F.size("_w").cast("double")
    nl = F.size("_l").cast("double")
    hashes = F.length("_t") - F.length(F.replace(F.col("_t"), F.lit("#"), F.lit("")))
    ellipses = (
        F.length("_t") - F.length(F.replace(F.col("_t"), F.lit("..."), F.lit("")))
    ) / 3
    stop = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    m = base.select(
        id_col,
        *passthrough,
        F.size("_w").alias("n_words"),
        F.round(
            F.when(nw == 0, 0.0).otherwise(
                F.aggregate(
                    "_w", F.lit(0).cast("long"), lambda a, w: a + F.length(w)
                ).cast("double")
                / nw
            ),
            6,
        ).alias("mean_word_len"),
        F.round(
            F.when(nw == 0, 0.0).otherwise((hashes + ellipses) / nw), 6
        ).alias("symbol_ratio"),
        F.round(
            F.size(
                F.filter(F.col("_l"), lambda l: F.ltrim(l).rlike(r"^[-*•]"))
            )
            / nl,
            6,
        ).alias("bullet_frac"),
        F.round(
            F.size(F.filter(F.col("_l"), lambda l: F.rtrim(l).endswith("...")))
            / nl,
            6,
        ).alias("ellipsis_frac"),
        F.round(
            F.when(nw == 0, 0.0).otherwise(
                F.size(F.filter("_w", lambda w: w.rlike("[A-Za-z]"))) / nw
            ),
            6,
        ).alias("alpha_word_frac"),
        F.size(
            F.array_intersect(F.transform("_w", F.lower), stop)
        ).alias("n_stopwords"),
    )
    ok = gopher_quality_rules(
        min_words=min_words,
        max_words=max_words,
        min_mean_word_len=min_mean_word_len,
        max_mean_word_len=max_mean_word_len,
        max_symbol_word_ratio=max_symbol_word_ratio,
        max_bullet_frac=max_bullet_frac,
        max_ellipsis_frac=max_ellipsis_frac,
        min_alpha_word_frac=min_alpha_word_frac,
        min_stopwords=min_stopwords,
    )
    out = m
    for name, expr in ok.items():
        out = out.withColumn(name, expr)
    all_ok = F.lit(True)
    for name in ok:
        all_ok = all_ok & F.col(name)
    return out.withColumn("pass", all_ok)


def gopher_quality_rules(
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopwords: int = 2,
) -> dict[str, Column]:
    """The Gopher quality rule set as boolean expressions over the METRIC
    columns :func:`gopher_quality_flags` emits (``n_words``,
    ``mean_word_len``, ``symbol_ratio``, ``bullet_frac``,
    ``ellipsis_frac``, ``alpha_word_frac``, ``n_stopwords``) — the single
    source of truth shared by the inline flag operator and the
    signals-table thresholding path (``pipeline.curation
    .curate_from_signals``), so a threshold iterated over a PUBLISHED
    signals table can never drift from the pipeline's own gate. Metrics
    are rounded to 6 at emission, so re-comparison here is exact."""
    return {
        "ok_words": (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words),
        "ok_word_len": (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len),
        "ok_symbol": F.col("symbol_ratio") <= max_symbol_word_ratio,
        "ok_bullet": F.col("bullet_frac") <= max_bullet_frac,
        "ok_ellipsis": F.col("ellipsis_frac") <= max_ellipsis_frac,
        "ok_alpha": F.col("alpha_word_frac") >= min_alpha_word_frac,
        "ok_stop": F.col("n_stopwords") >= min_stopwords,
    }


def gopher_quality_pass_expr(**thresholds) -> Column:
    """AND of :func:`gopher_quality_rules` — the ``pass`` conjunction
    evaluated against a signals frame instead of inline."""
    expr = F.lit(True)
    for rule in gopher_quality_rules(**thresholds).values():
        expr = expr & rule
    return expr


def gopher_dupline_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    max_dup_frac: float = 0.30,
    max_dup_char_frac: float = 0.20,
) -> DataFrame:
    """The remaining four Gopher §A1.1 rules (Rae et al. 2021, Table A1):
    duplicate LINE fraction and duplicate-line CHARACTER fraction —
    ``sep="\\n"`` gives the line rules (thresholds 0.30 / 0.20),
    ``sep="\\n\\n"`` the paragraph rules (0.30 / 0.20) — completing the
    published rule set next to :func:`gopher_quality_flags` (quality) and
    ``operators.corpus.gopher_repetition_flags`` (n-gram repetition).

    A "duplicate" occurrence is any repeat of a segment already seen in
    the SAME document: with n non-blank segments of which d are
    distinct, ``dup_frac = (n - d) / n`` and ``dup_char_frac = (total
    chars - chars of one copy of each distinct segment) / total chars``
    — each metric 0.0 for segment-less docs. Blank/whitespace-only
    segments are excluded (an empty line repeating is formatting, not
    content duplication).

    Scale: NO shuffle at all — both metrics are per-row array
    expressions (`array_distinct` + two fold sums) inside one codegen'd
    projection; cost is O(segments) per row.
    """
    t = F.col(text_col)
    base = df.select(
        F.col(id_col),
        F.filter(
            F.split(t, sep), lambda s: F.trim(s) != ""
        ).alias("_s"),
    ).withColumn("_d", F.array_distinct("_s"))

    def _chars(col_name: str) -> Column:
        return F.aggregate(
            col_name, F.lit(0).cast("long"), lambda a, s: a + F.length(s)
        )

    n, d = F.size("_s"), F.size("_d")
    out = base.select(
        id_col,
        n.cast("long").alias("n_segments"),
        F.round(
            F.when(n == 0, 0.0).otherwise((n - d) / n.cast("double")), 6
        ).alias("dup_frac"),
        F.round(
            F.when(n == 0, 0.0).otherwise(
                (_chars("_s") - _chars("_d")) / _chars("_s").cast("double")
            ),
            6,
        ).alias("dup_char_frac"),
    )
    return (
        out.withColumn("ok_dup", F.col("dup_frac") <= max_dup_frac)
        .withColumn("ok_dup_chars", F.col("dup_char_frac") <= max_dup_char_frac)
        .withColumn("pass", F.col("ok_dup") & F.col("ok_dup_chars"))
    )


def c4_line_clean(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 5,
    min_lines: int = 3,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """The C4 line-level cleaning rules (Raffel et al. 2020 §2.2): C4
    REWRITES pages where Gopher judges them — per document, keep only
    lines that end in terminal punctuation (``. ! ? "``) AND have at
    least ``min_words_per_line`` words, then flag the page: drop it
    entirely if it contains "lorem ipsum" or a curly brace (the paper's
    code/boilerplate tells), or if fewer than ``min_lines`` lines
    survive. Returns ``(id, clean_text, n_lines_kept, n_lines_dropped,
    has_lorem, has_brace, keep)`` — the cleaned text for the keepers and
    the drop-reason columns for the audit, complementing
    :func:`gopher_quality_flags` (which scores but never rewrites).

    Scale: one codegen'd map stage — line array materialized once as a
    projection attribute, both line predicates are JVM lambda filters,
    the page flags are plain string predicates; no shuffle, no Python.
    ``passthrough`` columns ride the projection unchanged (the
    :func:`gopher_quality_flags` convention) so the curation pipeline
    can rewrite text in place without a doc_id self-join.
    """
    t = F.col(text_col)
    base = df.select(
        F.col(id_col),
        *passthrough,
        t.alias("_t"),
        F.split(t, "\n").alias("_l"),
    )
    kept = F.filter(
        F.col("_l"),
        lambda l: F.rtrim(l).rlike(r'[.!?"]$')
        & (
            F.size(F.filter(F.split(F.trim(l), r"\s+"), lambda w: w != ""))
            >= min_words_per_line
        ),
    )
    out = base.select(
        id_col,
        *passthrough,
        F.array_join(kept, "\n").alias("clean_text"),
        F.size(kept).cast("long").alias("n_lines_kept"),
        (F.size("_l") - F.size(kept)).cast("long").alias("n_lines_dropped"),
        F.lower(F.col("_t")).contains("lorem ipsum").alias("has_lorem"),
        F.col("_t").contains("{").alias("has_brace"),
    )
    return out.withColumn(
        "keep",
        (~F.col("has_lorem"))
        & (~F.col("has_brace"))
        & (F.col("n_lines_kept") >= min_lines),
    )


def profile(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One-pass text profile: all metrics as a single projection."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        token_count(t).alias("n_tokens"),
        bpe_ish_token_count(t).alias("n_subwords"),
        char_count(t).alias("n_chars_m"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(stopword_ratio(t), 6).alias("stopword_ratio"),
        quality_score(t).alias("quality"),
        language_id(t).alias("lang_pred"),
        fingerprint(t).alias("fingerprint"),
    )
