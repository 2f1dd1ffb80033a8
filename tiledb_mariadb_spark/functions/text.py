"""Text-analysis column builders for large-scale training-data pipelines:
token counting, quality scoring, language-ID heuristics, fingerprinting.

All builders return JVM-side Column expressions (no Python UDFs) so they
stay inside whole-stage codegen at 100 TB.  Each has a ``*_sql`` twin that
emits the byte-identical DuckDB formula for oracle verification — the two
are kept adjacent so they cannot drift.

Counting uses length/replace arithmetic (not regex) because regex dialects
differ across engines while LENGTH/REPLACE are identical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small per-language stopword marker sets for the n-gram-ish language-ID
# heuristic.  Deliberately tiny — the operator's value is the *pipeline
# shape* (scored argmax over marker hits), not lexicography.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "a"),
    "de": ("der", "und", "die", "das"),
    "es": ("el", "la", "los", "de"),
    "fr": ("le", "la", "et", "les"),
}


def normalize_text(col: Column) -> Column:
    """Standard corpus normalization before hashing/dedup: lowercase,
    collapse whitespace runs, strip edge whitespace.  Pure Column chain —
    codegen-inline.  (Unicode lowercasing agrees between Spark and DuckDB
    for the corpus languages; locale-special cases like Turkish dotless-I
    are out of scope, as in the reference's UTF-8 tests.)"""
    from pyspark.sql import functions as F  # noqa: PLC0415

    return F.trim(F.regexp_replace(F.lower(col), "[ \\t\\n\\r]+", " "))


def normalize_text_sql(expr: str) -> str:
    return rf"TRIM(regexp_replace(lower({expr}), '[ \t\n\r]+', ' ', 'g'))"


def padded(col: Column) -> Column:
    """Space-pad so word-boundary counting works at string edges."""
    return F.concat(F.lit(" "), col, F.lit(" "))


def padded_sql(expr: str) -> str:
    return f"(' ' || {expr} || ' ')"


def occurrences(col: Column, sub: str) -> Column:
    """Non-overlapping occurrence count of ``sub`` via length arithmetic."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(sub), F.lit(""))))
        / F.lit(len(sub))
    ).cast("long")


def occurrences_sql(expr: str, sub: str) -> str:
    esc = sub.replace("'", "''")
    return (
        f"CAST((LENGTH({expr}) - LENGTH(REPLACE({expr}, '{esc}', ''))) / {len(sub)} AS BIGINT)"
    )


def token_count(col: Column) -> Column:
    """Whitespace token count (single-space-delimited corpus)."""
    return occurrences(col, " ") + 1


def token_count_sql(expr: str) -> str:
    return f"({occurrences_sql(expr, ' ')} + 1)"


def word_hits(col: Column, word: str) -> Column:
    """Count of a whole word (space-delimited) in the padded text."""
    return occurrences(padded(col), f" {word} ")


def word_hits_sql(expr: str, word: str) -> str:
    return occurrences_sql(padded_sql(expr), f" {word} ")


def lang_scores(col: Column) -> dict[str, Column]:
    """Marker-hit score per language."""
    out = {}
    for lang, words in LANG_MARKERS.items():
        score = F.lit(0).cast("long")
        for w in words:
            score = score + word_hits(col, w)
        out[lang] = score
    return out


def lang_scores_sql(expr: str) -> dict[str, str]:
    return {
        lang: "(" + " + ".join(word_hits_sql(expr, w) for w in words) + ")"
        for lang, words in LANG_MARKERS.items()
    }


def lang_id(col: Column) -> Column:
    """Argmax language with deterministic alphabetical tiebreak."""
    scores = lang_scores(col)
    langs = sorted(scores)  # alphabetical: ties resolve to the first
    best = F.greatest(*[scores[lang] for lang in langs])
    expr = F.lit("und")
    # build reversed CASE so earlier (alphabetical) langs win ties
    for lang in reversed(langs):
        expr = F.when(scores[lang] == best, F.lit(lang)).otherwise(expr)
    return expr


def lang_id_sql(expr: str) -> str:
    scores = lang_scores_sql(expr)
    langs = sorted(scores)
    best = "GREATEST(" + ", ".join(scores[lang] for lang in langs) + ")"
    cases = " ".join(
        f"WHEN {scores[lang]} = {best} THEN '{lang}'" for lang in langs
    )
    return f"(CASE {cases} ELSE 'und' END)"


def quality_features(col: Column) -> dict[str, Column]:
    """Deterministic quality metrics: chars, tokens, mean token length,
    stopword ratio.  Ratios are exact double divisions of exact ints."""
    n_chars = F.length(col).cast("long")
    n_tokens = token_count(col)
    stop_hits = F.lit(0).cast("long")
    for w in ("the", "a", "and", "of", "to"):
        stop_hits = stop_hits + word_hits(col, w)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": (n_chars - (n_tokens - 1)) / n_tokens,
        "stop_hits": stop_hits,
        "stop_ratio": stop_hits / n_tokens,
    }


def quality_features_sql(expr: str) -> dict[str, str]:
    n_chars = f"CAST(LENGTH({expr}) AS BIGINT)"
    n_tokens = token_count_sql(expr)
    stop_hits = (
        "(" + " + ".join(word_hits_sql(expr, w) for w in ("the", "a", "and", "of", "to")) + ")"
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": f"(({n_chars} - ({n_tokens} - 1)) / {n_tokens})",
        "stop_hits": stop_hits,
        "stop_ratio": f"({stop_hits} / {n_tokens})",
    }


# GPT-2-style pre-tokenizer: contractions, letter runs, digit runs,
# punctuation runs, whitespace.  Verified to match between Java regex
# (Spark) and RE2 (DuckDB) — both support \p{L}/\p{N} identically here.
BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count(col: Column) -> Column:
    """BPE-ish token count: number of pre-tokenizer matches — the unit a
    byte-pair encoder would then merge within.  JVM-side regexp_count;
    no Python."""
    return F.regexp_count(col, F.lit(BPE_PATTERN)).cast("long")


def bpe_token_count_sql(expr: str) -> str:
    sql_pat = BPE_PATTERN.replace("'", "''")
    return f"CAST(len(regexp_extract_all({expr}, '{sql_pat}')) AS BIGINT)"


def md5_hex(col: Column) -> Column:
    """Lowercase hex md5 of the UTF-8 bytes — identical in DuckDB's md5()."""
    return F.md5(col.cast("binary"))


def fingerprint(col: Column, prefix_len: int = 64) -> Column:
    """Document fingerprint: md5 of the normalized (trimmed) text."""
    return md5_hex(F.trim(col))


def fingerprint_sql(expr: str) -> str:
    return f"md5(TRIM({expr}))"
