"""Text-analysis column functions for large-scale training-data pipelines.

Every function here is a JVM-side column expression (whole-stage
codegen'd) — no Python anywhere in the per-row path, including language ID
and the rolling fingerprint (both were pandas UDFs in round 1 and are now
pure expressions).

Reference analog: the extension UDF contract
(/root/reference/tacotoolbox/sample/datamodel.py:40-75 — schema-first scalar
extensions) and the vectorize-don't-loop discipline (_metadata.py:299-303).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny public stopword lists for the language-ID heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "den", "von"],
    "fr": ["le", "la", "et", "les", "des", "est", "pas", "que", "une", "dans"],
    "es": ["el", "la", "que", "de", "los", "se", "las", "por", "un", "para"],
}

TOKEN_PATTERN = r"\s+"
#: BPE-ish subword splitter: words, numbers, or single punctuation marks
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (JVM-side). Trim first: split() on \\s+ would
    emit an empty leading token for text with leading whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), TOKEN_PATTERN)


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Subword-ish token count via regexp extraction (still JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), F.lit(0)))


def quality_features(col: Column | str) -> Column:
    """Struct of cheap quality signals: n_chars, n_tokens, mean token
    length, punctuation ratio, uppercase ratio, english-stopword ratio.
    Everything codegen'd; compose into scores downstream."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    n_chars = F.length(c)
    n_tokens = F.size(toks)
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(c, r"[A-Z]", ""))
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.array_intersect(toks, sw))
    return F.struct(
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        (n_chars / F.greatest(n_tokens, F.lit(1))).alias("mean_token_len"),
        (n_punct / F.greatest(n_chars, F.lit(1))).alias("punct_ratio"),
        (n_upper / F.greatest(n_chars, F.lit(1))).alias("upper_ratio"),
        (n_stop / F.greatest(n_tokens, F.lit(1))).alias("stopword_ratio"),
    )


def fingerprint(col: Column | str) -> Column:
    """Exact 64-bit content fingerprint of the normalized text (lowercase,
    collapsed whitespace) — the dedup key for exact duplicates."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))
    return F.xxhash64(norm)


def lang_id(col: Column | str) -> Column:
    """n-gram/stopword language-ID heuristic, entirely JVM-side: per
    language, count stopword occurrences among lowercased whitespace tokens
    (occurrences, not distinct — a text repeating 'the' scores higher);
    argmax with first-language-wins tie-break in STOPWORDS order; 'und'
    (undetermined) when nothing matches or the text is NULL.

    Replaces the round-1 pandas UDF that looped per row inside the batch —
    as column expressions the scoring stays inside whole-stage codegen and
    is expressible as a DuckDB oracle."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(F.lower(F.coalesce(c, F.lit(""))))
    langs = list(STOPWORDS)
    def _score(words: list[str]) -> Column:
        sw = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))

    scores = {lang: _score(STOPWORDS[lang]) for lang in langs}
    best = F.greatest(*scores.values())
    expr = F.when(best <= 0, F.lit("und"))
    for lang in langs:  # first max wins, in STOPWORDS declaration order
        expr = expr.when(scores[lang] == best, F.lit(lang))
    return F.coalesce(expr, F.lit("und"))


def rolling_fingerprint(col: Column | str) -> Column:
    """Order-sensitive 64-bit token-stream fingerprint: xxhash64 chained
    left-to-right over whitespace tokens (h := xxhash64(h, token)), vs the
    order-insensitive ``fingerprint``. Pure JVM column expression — the
    round-1 version looped per row AND per token inside a pandas UDF, the
    exact anti-pattern this module forbids. Deterministic, no RNG."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(F.coalesce(c, F.lit("")))
    return F.aggregate(
        toks,
        F.lit(0x9E3779B97F4A7C15 - (1 << 64)).cast("long"),  # signed 64-bit
        lambda acc, t: F.xxhash64(acc, t),
    )


def _run_scan(arr: Column) -> Column:
    """Single-pass run-length scan over a SORTED string array: one
    ``aggregate`` whose struct state carries distinct count, total chars,
    chars belonging to values that occur more than once (every instance
    counted), and the best (count, char-length, value) run under
    lexicographic (cnt, len, value) maximization.

    This is the scale-critical shape for per-row repetition stats: the
    obvious formulation — for each distinct value, ``filter`` the array
    for equality — re-evaluates the array-construction subtree per probe
    (higher-order-function lambdas inline their argument expression), so
    an L-element array costs O(L^2) evaluations of an O(L) expression:
    cubic per row. One sort + one linear fold keeps it O(L log L) with
    the array built once.
    """
    start = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("n_dist"),
        F.lit(0).alias("chars"),
        F.lit(0).alias("dup_chars"),
        F.lit(0).alias("best_cnt"),
        F.lit(0).alias("best_len"),
        F.lit("").alias("best_val"),
    )

    def step(acc: Column, x: Column) -> Column:
        ln = F.length(x)
        is_dup = x == acc["prev"]
        run = F.when(is_dup, acc["run"] + 1).otherwise(F.lit(1))
        dup_chars = acc["dup_chars"] + (
            F.when(run == 2, ln + ln)  # first instance counts too
            .when(run > 2, ln)
            .otherwise(F.lit(0))
        )
        better = (run > acc["best_cnt"]) | (
            (run == acc["best_cnt"])
            & ((ln > acc["best_len"]) | ((ln == acc["best_len"]) & (x > acc["best_val"])))
        )
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            (acc["n_dist"] + F.when(is_dup, 0).otherwise(1)).alias("n_dist"),
            (acc["chars"] + ln).alias("chars"),
            dup_chars.alias("dup_chars"),
            F.when(better, run).otherwise(acc["best_cnt"]).alias("best_cnt"),
            F.when(better, ln).otherwise(acc["best_len"]).alias("best_len"),
            F.when(better, x).otherwise(acc["best_val"]).alias("best_val"),
        )

    return F.aggregate(F.array_sort(arr), start, step)


def repetition_features(col: Column | str) -> Column:
    """Gopher-style repetition quality signals (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", §A1.1 repetition filters —
    public paper, formulas reimplemented; no code consulted). Struct of:

    * ``n_lines``            — non-empty lines (text split on ``\\n``)
    * ``dup_line_frac``      — (n_lines - n_distinct_lines) / n_lines
    * ``dup_line_char_frac`` — chars in line INSTANCES whose line occurs
      more than once / total line chars
    * ``top_bigram_frac``    — occurrences x char-length of the most
      frequent word 2-gram / n_chars (ties: longer gram, then
      lexicographically larger gram — deterministic)
    * ``dup_trigram_frac``   — sum over distinct word 3-grams occurring
      more than once of occurrences x char-length / n_chars (overlaps
      counted per occurrence, so > 1.0 is possible on degenerate text;
      callers threshold well below that)

    Grams join tokens with a single space, so char-lengths count the
    separator; every fraction is a SINGLE int/int double division,
    making it bit-reproducible in any engine that follows IEEE-754 (the
    DuckDB oracle matches exactly).

    Everything is a per-row JVM column expression — no shuffle, no
    Python, no explode: each array is scanned by ``_run_scan``'s single
    sorted fold, O(L log L) per document. For book-length texts where
    even that per-row cost dominates, an explode + groupBy variant
    distributes the work instead.
    """
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c)
    toks = tokens(c)
    n_tokens = F.size(toks)

    lines = F.filter(F.split(c, "\n"), lambda l: F.length(l) > 0)
    n_lines = F.size(lines)
    lsc = _run_scan(lines)
    dup_line_frac = (n_lines - lsc["n_dist"]).cast("double") / F.greatest(
        n_lines, F.lit(1)
    )
    dup_line_char_frac = lsc["dup_chars"].cast("double") / F.greatest(
        lsc["chars"], F.lit(1)
    )

    # Build grams by zipping shifted slices of the token array, NOT by
    # transform(sequence, i -> element_at(toks, i)): a lambda inlines its
    # captured expression, so element_at-style indexing re-tokenizes the
    # whole text per gram (measured 8s vs <1s on 5k web-sized docs).
    # zip_with's ARGUMENT arrays are evaluated once per row.
    def grams(n: int) -> Column:
        out = F.zip_with(
            F.slice(toks, 1, F.greatest(n_tokens - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(n_tokens - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
        if n == 3:
            out = F.zip_with(
                F.slice(out, 1, F.greatest(n_tokens - 2, F.lit(0))),
                F.slice(toks, 3, F.greatest(n_tokens - 2, F.lit(0))),
                lambda ab, c2: F.concat(ab, F.lit(" "), c2),
            )
        return F.when(n_tokens < n, F.array().cast("array<string>")).otherwise(
            out
        )

    g2 = _run_scan(grams(2))
    top_bigram_frac = (g2["best_cnt"] * g2["best_len"]).cast(
        "double"
    ) / F.greatest(n_chars, F.lit(1))

    g3 = _run_scan(grams(3))
    dup_trigram_frac = g3["dup_chars"].cast("double") / F.greatest(
        n_chars, F.lit(1)
    )

    return F.struct(
        n_lines.cast("long").alias("n_lines"),
        dup_line_frac.alias("dup_line_frac"),
        dup_line_char_frac.alias("dup_line_char_frac"),
        top_bigram_frac.alias("top_bigram_frac"),
        dup_trigram_frac.alias("dup_trigram_frac"),
    )
