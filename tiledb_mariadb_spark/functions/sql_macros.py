"""Engine functions as pure-SQL temporary functions (Spark SQL UDFs,
``CREATE TEMPORARY FUNCTION ... RETURN <expr>``): a user living entirely
in ``spark.sql`` gets the text/dedup function library without touching
the DataFrame API — and the bodies are catalyst expressions, so they
inline into whole-stage codegen exactly like the Column versions (no
Python boundary; a SQL UDF is a macro, not a UDF in the slow-path
sense)."""

from __future__ import annotations

from pyspark.sql import SparkSession

from tiledb_mariadb_spark.functions.pipeline import (
    EMAIL_RE,
    PHONE_RE,
    hash_fraction_spark_sql,
)
from tiledb_mariadb_spark.functions.text import (
    BPE_PATTERN,
    fingerprint_sql,
    lang_id_sql,
    token_count_sql,
)


def _spark_str_lit(pat: str) -> str:
    """Escape for a Spark SQL single-quoted literal (C-style escapes on)."""
    return pat.replace("\\", "\\\\").replace("'", "''")


def sql_function_defs() -> dict[str, tuple[str, str, str]]:
    """name → (arg signature, return type, body expr over the arg)."""
    return {
        "tile_fingerprint": ("(t STRING)", "STRING", fingerprint_sql("t")),
        "tile_token_count": ("(t STRING)", "BIGINT", token_count_sql("t")),
        "tile_lang_id": ("(t STRING)", "STRING", lang_id_sql("t")),
        "tile_bpe_tokens": (
            "(t STRING)",
            "BIGINT",
            f"CAST(regexp_count(t, '{_spark_str_lit(BPE_PATTERN)}') AS BIGINT)",
        ),
        "tile_split": (
            "(k STRING, test_frac DOUBLE)",
            "STRING",
            f"CASE WHEN {hash_fraction_spark_sql('k', 'split')} < test_frac"
            " THEN 'test' ELSE 'train' END",
        ),
        "tile_redact_pii": (
            "(t STRING)",
            "STRING",
            f"regexp_replace(regexp_replace(t, '{_spark_str_lit(EMAIL_RE)}',"
            f" '<EMAIL>'), '{_spark_str_lit(PHONE_RE)}', '<PHONE>')",
        ),
        # q144's map-only quality gate as a macro: 1 - distinct/total
        # word-3-grams.  A macro body is ONE expression (no projection to
        # stage through), so the split and the shingle array are bound once
        # via the transform(array(x), v -> ...)[1] let-idiom — otherwise
        # each lambda re-evaluates split() PER ELEMENT (no CSE across
        # lambdas; see the verify recipe).
        "tile_repetition_ratio": (
            "(t STRING)",
            "DOUBLE",
            "element_at(transform(array(split(trim(t), ' ')), ws ->"
            " element_at(transform(array(transform(sequence(1, size(ws) - 2),"
            " i -> concat_ws(' ', slice(ws, i, 3)))), arr ->"
            " 1.0D - CAST(size(array_distinct(arr)) AS DOUBLE)"
            " / CAST(size(arr) AS DOUBLE)), 1)), 1)",
        ),
        # q176's chunker as a macro returning the chunk-text array
        # (LATERAL VIEW explode() turns it into rows); same let-idiom
        "tile_chunks": (
            "(t STRING)",
            "ARRAY<STRING>",
            "element_at(transform(array(split(trim(t), ' ')), ws ->"
            " transform(sequence(0, CAST(floor((size(ws) - 1)"
            " / 30) AS INT)),"
            " c -> concat_ws(' ', slice(ws, c * 30 + 1, 40)))), 1)",
        ),
    }


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Install the function library into the session; returns the names."""
    names = []
    for name, (args, ret, body) in sql_function_defs().items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{args} "
            f"RETURNS {ret} RETURN {body}"
        )
        names.append(name)
    return names
