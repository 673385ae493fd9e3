"""target_expr mini-language translation tests (SURVEY.md §2 F5)."""

import pytest

from kinesis_data_counter_spark.expr import (
    translate_target_expr,
    translate_target_expr_duckdb,
)


@pytest.mark.parametrize(
    "src,expected",
    [
        ("nil", "NULL"),
        ("as_string(user_id)", "string(user_id)"),
        ('string_contains(path, "my_page")', 'contains(path, "my_page")'),
        ('if(string_contains(path,"my_page"), user_id, nil)',
         'if(contains(path,"my_page"), user_id, NULL)'),
        ('as_string(coalesce(request_id, "")) != ""',
         'string(coalesce(request_id, "")) != ""'),
        ("1", "1"),
        # identifiers merely containing keyword substrings are untouched
        ("nilpotent + as_string_x", "nilpotent + as_string_x"),
        # string literals are opaque
        ('"nil as_string"', '"nil as_string"'),
    ],
)
def test_spark_translation(src, expected):
    assert translate_target_expr(src) == expected


def test_duckdb_if_rewrite():
    out = translate_target_expr_duckdb('if(string_contains(path,"x"), user_id, nil)')
    # the double-quoted grammar literal becomes a SQL string literal —
    # in DuckDB "x" would be an identifier
    assert out == "(CASE WHEN contains(path,'x') THEN user_id ELSE NULL END)"


def test_duckdb_nested_if():
    out = translate_target_expr_duckdb("if(a, if(b, 1, 2), nil)")
    assert out == "(CASE WHEN a THEN (CASE WHEN b THEN 1 ELSE 2 END) ELSE NULL END)"


def test_duckdb_as_string():
    out = translate_target_expr_duckdb('as_string(coalesce(x, ""))')
    assert out == "CAST(coalesce(x, '') AS VARCHAR)"


def test_duckdb_literal_requoting_edge_cases():
    # embedded escaped double quote and single quote survive correctly
    assert translate_target_expr_duckdb('string_contains(a, "it\\"s")') == (
        "contains(a, 'it\"s')"
    )
    assert translate_target_expr_duckdb("string_contains(a, \"o'clock\")") == (
        "contains(a, 'o''clock')"
    )
    # renames never fire inside literals
    assert translate_target_expr_duckdb('"nil as_string"') == "'nil as_string'"


def test_if_arity_error():
    with pytest.raises(ValueError):
        translate_target_expr_duckdb("if(a, b)")


def test_expr_evaluates_in_spark(spark):
    from kinesis_data_counter_spark.expr import compile_target_expr

    df = spark.createDataFrame([(1, "/my_page"), (2, "/")], "user_id long, path string")
    col = compile_target_expr('if(string_contains(path,"my_page"), user_id, nil)')
    vals = [r[0] for r in df.select(col).collect()]
    assert vals == [1, None]


def test_duckdb_structural_rewrites_never_touch_literal_content():
    # literal content that LOOKS like rewritable syntax must pass through
    assert translate_target_expr_duckdb('string_contains(a, "use as_string(x) here")') == (
        "contains(a, 'use as_string(x) here')"
    )
    assert translate_target_expr_duckdb('string_contains(a, "if(a,b,c)")') == (
        "contains(a, 'if(a,b,c)')"
    )
    # literal ending in a backslash must not derail the paren scanner
    assert translate_target_expr_duckdb('string_contains(a, "x\\\\")') == (
        "contains(a, 'x\\')"
    )
    # rewrites still fire OUTSIDE literals in the same expression
    assert translate_target_expr_duckdb('if(string_contains(a, "if("), as_string(b), nil)') == (
        "(CASE WHEN contains(a, 'if(') THEN CAST(b AS VARCHAR) ELSE NULL END)"
    )


def test_c_style_logical_operators_translate(spark):
    from kinesis_data_counter_spark.expr import compile_target_expr, translate_target_expr

    assert translate_target_expr("a && b || !c").split() == ["a", "AND", "b", "OR", "NOT", "c"]
    # `!=` must survive untouched (not lexed as `!` + `=`)
    assert translate_target_expr('x != "a&&b"') == 'x != "a&&b"'  # literal opaque
    df = spark.createDataFrame([(True, False), (False, False)], "a boolean, b boolean")
    got = df.select(compile_target_expr("a && !b").alias("v")).collect()
    assert [r.v for r in got] == [True, False]
