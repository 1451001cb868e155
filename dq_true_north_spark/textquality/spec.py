"""Dual-dialect expression spec for the Gopher/C4-style heuristic metrics.

Every per-document metric is defined ONCE here and rendered into two SQL
dialects: Spark SQL (executed via F.expr inside the distributed pipeline —
whole-stage-codegen, no Python in the hot path) and DuckDB SQL (the
correctness oracle the driver runs side-by-side). A third rendering — plain
Python in tests/golden.py — shares the same constants module.

Reference analog: the reference evaluates per-column checks one scan per
column (dq_rules_library.py:675-699); here every metric is a column in ONE
wide select, so the 100 TB corpus is scanned exactly once.
"""

from __future__ import annotations

from .. import constants as C

SPARK, DUCK = "spark", "duck"

# Cross-engine regex caveat (documented contract): `\s` is ASCII-only in
# Java regex and RE2 but Unicode-aware in Python `re`. The frozen spec
# therefore defines a "word" over ASCII whitespace only, and the supported
# input domain is printable text whose whitespace is ASCII (true for
# extracted web text after normalization — and enforced by the property
# tests in tests/test_properties.py over that alphabet). Unicode whitespace
# (NBSP etc.) must be normalized upstream of the filter.


def _rx(dialect: str, pattern: str) -> str:
    """Render a regex as a string literal for the dialect.

    Spark SQL string literals are backslash-escaped; DuckDB's are not.
    """
    if dialect == SPARK:
        return "'" + pattern.replace("\\", "\\\\").replace("'", "\\'") + "'"
    return "'" + pattern.replace("'", "''") + "'"


def rx_count(dialect: str, expr: str, pattern: str) -> str:
    p = _rx(dialect, pattern)
    if dialect == SPARK:
        return f"regexp_count({expr}, {p})"
    return f"len(regexp_extract_all({expr}, {p}))"


def size(dialect: str, arr: str) -> str:
    return f"size({arr})" if dialect == SPARK else f"len({arr})"


def words(dialect: str, expr: str) -> str:
    """Array of non-empty whitespace-separated tokens."""
    p = _rx(dialect, r"\s+")
    if dialect == SPARK:
        return f"filter(split({expr}, {p}), w -> w <> '')"
    return f"list_filter(regexp_split_to_array({expr}, {p}), w -> w <> '')"


def lines(dialect: str, expr: str) -> str:
    if dialect == SPARK:
        return f"split({expr}, '\\n')"
    return f"string_split({expr}, chr(10))"


def arr_lit(dialect: str, items) -> str:
    quoted = ", ".join("'" + i.replace("'", "''") + "'" for i in items)
    return f"array({quoted})" if dialect == SPARK else f"[{quoted}]"


def arr_filter(dialect: str, arr: str, lam: str) -> str:
    fn = "filter" if dialect == SPARK else "list_filter"
    return f"{fn}({arr}, {lam})"


def arr_contains(dialect: str, arr: str, elem: str) -> str:
    fn = "array_contains" if dialect == SPARK else "list_contains"
    return f"{fn}({arr}, {elem})"


def arr_distinct(dialect: str, arr: str) -> str:
    fn = "array_distinct" if dialect == SPARK else "list_distinct"
    return f"{fn}({arr})"


def arr_intersect(dialect: str, a: str, b: str) -> str:
    fn = "array_intersect" if dialect == SPARK else "list_intersect"
    return f"{fn}({a}, {b})"




def round4(expr: str, n: int = 4) -> str:
    """Deterministic cross-engine rounding: floor(x*10^n + 0.5)/10^n.

    Spark's round() (BigDecimal HALF_UP on the exact binary value),
    DuckDB's round(), and Python's round() (half-even) disagree at decimal
    half-boundaries — ratios of 2-decimal inputs hit them for real
    (46.71/1.6 = 29.19375 rounded to .1937 by Spark, .1938 by DuckDB at
    sf0.1). floor/multiply/add are individually-exact IEEE ops, so this
    rendering is bit-identical across Spark SQL, DuckDB and CPython by
    construction (half-toward-+inf convention). tests/golden.py mirrors it
    as _r4."""
    return f"(floor(({expr}) * 1e{n} + 0.5) / 1e{n})"


def round4_col(col, n: int = 4):
    """Column-side rendering of the SAME frozen formula as round4 above —
    the single definition for DataFrame-API call sites (rules, df queries),
    so a future change to the rounding spec edits round4/round4_col/_r4
    together instead of hunting inlined copies."""
    from pyspark.sql import functions as F

    return F.floor(col * float(10**n) + F.lit(0.5)) / float(10**n)


def round4_signed(expr: str, n: int = 4) -> str:
    """Half-AWAY-FROM-ZERO variant for display columns that carry sign
    (spike/dip percent_change, signed metrics): plain floor-round4 rounds
    NEGATIVE half-boundaries toward +inf (-0.00005 -> 0.0), losing the
    sign (ADVICE r3 #3). sign(x)·floor(|x|·10^n + 0.5)/10^n keeps the
    magnitude rule symmetric around zero and stays bit-identical across
    Spark SQL / DuckDB / CPython for the same IEEE reasons as round4
    (sign/abs/floor are exact; the sign·floor product is an exact
    integer-valued double). For x >= 0 it equals round4 exactly, so it is
    safe to apply uniformly to a mixed-sign column. Convention: round4
    (half-toward-+inf) remains the default for NON-NEGATIVE quantities
    (ratios, fractions, stddevs); sign-carrying display columns use this."""
    return f"(sign({expr}) * floor(abs({expr}) * 1e{n} + 0.5) / 1e{n})"


def round4_signed_col(col, n: int = 4):
    """Column-side rendering of round4_signed (one definition, two call
    surfaces — same discipline as round4/round4_col)."""
    from pyspark.sql import functions as F

    return F.signum(col) * F.floor(F.abs(col) * float(10**n) + F.lit(0.5)) \
        / float(10**n)


def word_ngrams(d: str, words_expr: str, n: int) -> str:
    """Word n-gram array, SAFE for documents with fewer than n words.

    Spark's sequence(1, 0) yields a DESCENDING [1, 0] (not an empty array),
    and slice(arr, 0, n) then throws INVALID_PARAMETER_VALUE.START — so the
    unguarded `sequence(1, greatest(len-n+1, 0))` construction crashes the
    whole job on any 0..n-1-word document (real crawls always contain
    some). DuckDB's generate_series(1, 0) is empty, hiding the divergence.
    Guard with CASE in BOTH dialects so the renderings stay symmetric."""
    if d == SPARK:
        gen = (f"transform(sequence(1, size({words_expr}) - {n - 1}), "
               f"i -> concat_ws(' ', slice({words_expr}, i, {n})))")
        return (f"CASE WHEN size({words_expr}) >= {n} THEN {gen} "
                f"ELSE array() END")
    gen = (f"list_transform(generate_series(1, len({words_expr}) - {n - 1}), "
           f"i -> array_to_string(list_slice({words_expr}, i, i + {n - 1}), ' '))")
    return f"CASE WHEN len({words_expr}) >= {n} THEN {gen} ELSE [] END"


# --------------------------------------------------------------- metrics ---
# Each metric is a function (dialect, text_expr) -> SQL expression string.

def n_words(d: str, t: str) -> str:
    return rx_count(d, t, r"\S+")


def n_word_chars(d: str, t: str) -> str:
    # total characters inside words = doc length minus whitespace
    p = _rx(d, r"\s")
    gflag = ", 'g'" if d == DUCK else ""  # DuckDB replaces first match only by default
    return f"length(regexp_replace({t}, {p}, ''{gflag}))"


def mean_word_len(d: str, t: str) -> str:
    return round4(
        f"CAST({n_word_chars(d, t)} AS DOUBLE) / nullif({n_words(d, t)}, 0)"
    )


def symbol_word_ratio(d: str, t: str) -> str:
    sym = rx_count(d, t, r"[#…]")
    return round4(f"CAST({sym} AS DOUBLE) / nullif({n_words(d, t)}, 0)")


def _lower_words(d: str, t: str) -> str:
    return words(d, f"lower({t})")


def stopword_count(d: str, t: str) -> str:
    stops = arr_lit(d, C.STOPWORDS)
    lam = f"w -> {arr_contains(d, stops, 'w')}"
    return size(d, arr_filter(d, _lower_words(d, t), lam))


def stopword_fraction(d: str, t: str) -> str:
    return round4(
        f"CAST({stopword_count(d, t)} AS DOUBLE) / nullif({n_words(d, t)}, 0)"
    )


def distinct_stopwords(d: str, t: str) -> str:
    stops = arr_lit(d, C.STOPWORDS)
    return size(d, arr_intersect(d, arr_distinct(d, _lower_words(d, t)), stops))


def alpha_word_count(d: str, t: str) -> str:
    # words containing at least one ASCII letter (non-overlapping \S-runs)
    return rx_count(d, t, r"[^\s]*[A-Za-z][^\s]*")


def non_alpha_word_fraction(d: str, t: str) -> str:
    return round4(
        f"CAST({n_words(d, t)} - {alpha_word_count(d, t)} AS DOUBLE) / "
        f"nullif({n_words(d, t)}, 0)"
    )


def _nonempty_lines(d: str, t: str) -> str:
    return arr_filter(d, lines(d, t), "l -> l <> ''")


def ellipsis_line_fraction(d: str, t: str) -> str:
    nl = _nonempty_lines(d, t)
    hit = arr_filter(d, nl, "l -> l LIKE '%...'")
    return round4(f"CAST({size(d, hit)} AS DOUBLE) / nullif({size(d, nl)}, 0)")


def bullet_line_fraction(d: str, t: str) -> str:
    nl = _nonempty_lines(d, t)
    pred = "l -> l LIKE '- %' OR l LIKE '* %' OR l LIKE '•%'"
    hit = arr_filter(d, nl, pred)
    return round4(f"CAST({size(d, hit)} AS DOUBLE) / nullif({size(d, nl)}, 0)")


def dup_line_fraction(d: str, t: str) -> str:
    nl = _nonempty_lines(d, t)
    return round4(
        f"1.0 - CAST({size(d, arr_distinct(d, nl))} AS DOUBLE) / "
        f"nullif({size(d, nl)}, 0)"
    )


def bpe_token_count(d: str, t: str) -> str:
    return rx_count(d, t, C.BPE_TOKEN_PATTERN)


def bpe_tokens(d: str, t: str) -> str:
    """Array of BPE-ish tokens. The pattern TILES the input — every
    character belongs to exactly one token (whitespace runs are tokens
    too), so concatenating the array with '' reconstructs the text
    byte-for-byte. Token-aware chunking (doc_chunks_tokens) relies on
    exactly this: slicing the array can never split a token, and joining
    a slice yields a true substring of the original. Spark's
    regexp_extract_all defaults to capture group 1 (the pattern contains a
    non-capturing group), so group 0 is passed explicitly."""
    p = _rx(d, C.BPE_TOKEN_PATTERN)
    if d == SPARK:
        return f"regexp_extract_all({t}, {p}, 0)"
    return f"regexp_extract_all({t}, {p})"


# ------------------------------------------------- drop-reason predicates ---
# (reason_code, predicate-SQL builder). Order is C.DROP_REASON_ORDER minus the
# UDF-backed reasons (lang-confidence, perplexity) which join in later.

def heuristic_drop_predicates(d: str, t: str) -> list[tuple[str, str]]:
    return [
        (C.REASON_TOO_SHORT, f"{n_words(d, t)} < {C.MIN_WORDS}"),
        (C.REASON_TOO_LONG, f"{n_words(d, t)} > {C.MAX_WORDS}"),
        (
            C.REASON_MEAN_WORD_LEN,
            f"({mean_word_len(d, t)} < {C.MIN_MEAN_WORD_LEN} OR "
            f"{mean_word_len(d, t)} > {C.MAX_MEAN_WORD_LEN})",
        ),
        (C.REASON_SYMBOL_RATIO, f"{symbol_word_ratio(d, t)} > {C.MAX_SYMBOL_WORD_RATIO}"),
        (
            C.REASON_STOPWORDS,
            f"({stopword_fraction(d, t)} < {C.MIN_STOPWORD_FRACTION} OR "
            f"{distinct_stopwords(d, t)} < {C.MIN_DISTINCT_STOPWORDS})",
        ),
        (C.REASON_NON_ALPHA, f"{non_alpha_word_fraction(d, t)} > {C.MAX_NON_ALPHA_WORD_FRACTION}"),
        (C.REASON_ELLIPSIS, f"coalesce({ellipsis_line_fraction(d, t)}, 0.0) > {C.MAX_ELLIPSIS_LINE_FRACTION}"),
        (C.REASON_BULLET, f"coalesce({bullet_line_fraction(d, t)}, 0.0) > {C.MAX_BULLET_LINE_FRACTION}"),
        (C.REASON_DUP_LINES, f"coalesce({dup_line_fraction(d, t)}, 0.0) > {C.MAX_DUP_LINE_FRACTION}"),
    ]


METRICS = {
    "n_words": n_words,
    "n_word_chars": n_word_chars,
    "mean_word_len": mean_word_len,
    "symbol_word_ratio": symbol_word_ratio,
    "stopword_count": stopword_count,
    "stopword_fraction": stopword_fraction,
    "distinct_stopwords": distinct_stopwords,
    "alpha_word_count": alpha_word_count,
    "non_alpha_word_fraction": non_alpha_word_fraction,
    "ellipsis_line_fraction": ellipsis_line_fraction,
    "bullet_line_fraction": bullet_line_fraction,
    "dup_line_fraction": dup_line_fraction,
    "bpe_token_count": bpe_token_count,
}
