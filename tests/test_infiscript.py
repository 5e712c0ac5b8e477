import pytest

from infidex_spark.functions.infiscript import InfiscriptError, infiscript_to_sql


def test_comparisons():
    assert infiscript_to_sql("year >= 2000") == "(`year` >= 2000)"
    assert infiscript_to_sql("genre = 'Fantasy'") == "(`genre` = 'Fantasy')"
    assert infiscript_to_sql("x != -3.5") == "(`x` != -3.5)"


def test_boolean_ops_and_precedence():
    got = infiscript_to_sql("a = 1 OR b = 2 AND c = 3")
    assert got == "((`a` = 1) OR ((`b` = 2) AND (`c` = 3)))"
    got = infiscript_to_sql("(a = 1 || b = 2) && !(c = 3)")
    assert got == "((((`a` = 1) OR (`b` = 2))) AND (NOT ((`c` = 3))))"


def test_string_operators():
    assert infiscript_to_sql("title CONTAINS 'magic'") == "contains(`title`, 'magic')"
    assert infiscript_to_sql("t STARTS WITH 'The'") == "startswith(`t`, 'The')"
    assert infiscript_to_sql("t ENDS WITH 'Kingdom'") == "endswith(`t`, 'Kingdom')"
    assert infiscript_to_sql("t LIKE '%Harry%'") == "(`t` LIKE '%Harry%')"
    assert infiscript_to_sql("e MATCHES '^x$'") == "(`e` RLIKE '^x$')"


def test_in_between_null():
    assert (
        infiscript_to_sql("genre IN ('Fantasy', 'Horror')")
        == "(`genre` IN ('Fantasy', 'Horror'))"
    )
    assert infiscript_to_sql("year BETWEEN 2000 AND 2020") == "(`year` BETWEEN 2000 AND 2020)"
    assert infiscript_to_sql("d IS NULL") == "(`d` IS NULL)"
    assert infiscript_to_sql("d IS NOT NULL") == "(`d` IS NOT NULL)"


def test_ternary_right_associative():
    got = infiscript_to_sql("a = 1 ? b = 2 : c = 3 ? d = 4 : e = 5")
    assert got == (
        "(CASE WHEN (`a` = 1) THEN (`b` = 2) ELSE "
        "(CASE WHEN (`c` = 3) THEN (`d` = 4) ELSE (`e` = 5) END) END)"
    )


def test_case_insensitive_keywords():
    assert infiscript_to_sql("a in (1, 2) and b between 1 and 2") == (
        "((`a` IN (1, 2)) AND (`b` BETWEEN 1 AND 2))"
    )


@pytest.mark.parametrize(
    "bad",
    [
        "",
        "AND x = 1",
        "x CONTAINS 5",  # string operator needs string literal
        "x BETWEEN 1 OR 2",
        "x IS 5",
        "x IN ()",
        "x = ",
        "x = 1 extra garbage =",
        "1 = x",
    ],
)
def test_malformed_rejected(bad):
    with pytest.raises(InfiscriptError):
        infiscript_to_sql(bad)


def test_spark_accepts_output(spark):
    df = spark.createDataFrame(
        [(1, "Fantasy", 2001, None), (2, "Horror", 1990, "x")],
        "id int, genre string, year int, note string",
    )
    from infidex_spark.functions.postprocess import apply_filter

    got = apply_filter(
        df, "genre IN ('Fantasy','Sci-Fi') AND year >= 2000 AND note IS NULL"
    ).collect()
    assert [r.id for r in got] == [1]
    got = apply_filter(df, "genre = 'Horror' ? note IS NOT NULL : year >= 2000").collect()
    assert sorted(r.id for r in got) == [1, 2]
