"""Nested field-path transforms (operators/fields.py) — semantics mirror
the reference's path DSL (chomper/utils.py:82-148, tests/test_utils.py:23-80)
and dict-field processors (chomper/processors.py:181-205, :302-316,
tests/test_processors.py:116-159)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chomper_spark.operators import fields as fp
from chomper_spark.operators.transforms import pipe


def test_parse_path():
    # chomper/utils.py:82-97 doc example
    assert fp.parse_path("users[0].address.city") == ["users", 0, "address", "city"]
    assert fp.parse_path("name") == ["name"]
    assert fp.parse_path("a[1][2].b") == ["a", 1, 2, "b"]


def _nested_df(spark):
    return spark.createDataFrame(
        [
            (1, ("Ada", ("Good Corp", "NYC")), [("f1",), ("f2",)], {"a": "1"}),
            (2, (None, None), [("g1",)], {"a": None, "b": "2"}),
            (3, None, None, None),
        ],
        "id int, job struct<name:string, company:struct<name:string,city:string>>, "
        "friends array<struct<name:string>>, props map<string,string>",
    )


def test_get_and_set_struct_path(spark):
    df = _nested_df(spark)
    got = df.select(fp.get_path("job.company.city").alias("c")).collect()
    assert [r["c"] for r in got] == ["NYC", None, None]

    out = pipe(df, fp.set_path("job.company.city", "SF"))
    vals = {r["id"]: r["job"] for r in out.collect()}
    assert vals[1]["company"]["city"] == "SF"
    # NULL parents stay NULL — the reference's silent no-op (utils.py:109-122)
    assert vals[2]["company"] is None
    assert vals[3] is None


def test_set_array_index_path(spark):
    df = _nested_df(spark)
    out = pipe(df, fp.set_path("friends[1].name", F.lit("Perry")))
    vals = {r["id"]: r["friends"] for r in out.collect()}
    assert [f["name"] for f in vals[1]] == ["f1", "Perry"]
    assert [f["name"] for f in vals[2]] == ["g1"]  # index past end: no-op
    assert vals[3] is None


def test_scalar_map_path_null_skip(spark):
    # examples/fields.py:36-41: per-path Filter transforms
    df = _nested_df(spark)
    out = pipe(
        df,
        fp.scalar_map_path("job.company.name", lambda c: F.replace(c, F.lit("Good "), F.lit(""))),
        fp.scalar_map_path("friends[0].name", lambda c: F.upper(c)),
    )
    vals = {r["id"]: r for r in out.collect()}
    assert vals[1]["job"]["company"]["name"] == "Corp"
    assert vals[1]["friends"][0]["name"] == "F1"
    assert vals[2]["job"]["company"] is None  # NULL skipped, not an error


def test_set_map_key_and_drop_path(spark):
    df = _nested_df(spark)
    out = pipe(df, fp.set_path("props.a", "9"))
    vals = {r["id"]: r["props"] for r in out.collect()}
    assert vals[1] == {"a": "9"} and vals[2]["a"] == "9" and vals[2]["b"] == "2"
    assert vals[3] is None

    out2 = pipe(df, fp.drop_path("props.a"))
    vals2 = {r["id"]: r["props"] for r in out2.collect()}
    assert vals2[1] == {} and vals2[2] == {"b": "2"}

    out3 = pipe(df, fp.drop_path("job.company.city"))
    assert "city" not in out3.schema["job"].dataType["company"].dataType.fieldNames()
    assert out3.filter("id = 1").collect()[0]["job"]["company"]["name"] == "Good Corp"


def test_nested_defaults_struct(spark):
    # dict-field Defaulter: only None/missing filled; falsy kept;
    # NULL field → struct of defaults (chomper/processors.py:181-205,
    # falsy-vs-None semantics tests/test_processors.py:48-55)
    df = spark.createDataFrame(
        [(1, ("", None)), (2, ("t", 0)), (3, None)],
        "id int, meta struct<tool:string, score:int>",
    )
    out = pipe(df, fp.nested_defaults("meta", {"tool": "none", "score": 7, "lang": "en"}))
    vals = {r["id"]: r["meta"] for r in out.collect()}
    assert vals[1]["tool"] == "" and vals[1]["score"] == 7  # falsy '' kept
    assert vals[2]["tool"] == "t" and vals[2]["score"] == 0  # falsy 0 kept
    assert vals[3]["tool"] == "none" and vals[3]["score"] == 7
    assert all(vals[i]["lang"] == "en" for i in (1, 2, 3))  # new key appended


def test_nested_defaults_map(spark):
    df = _nested_df(spark)
    out = pipe(df, fp.nested_defaults("props", {"a": "da", "c": "dc"}))
    vals = {r["id"]: r["props"] for r in out.collect()}
    assert vals[1] == {"a": "1", "c": "dc"}          # existing kept
    assert vals[2] == {"a": "da", "b": "2", "c": "dc"}  # NULL value filled
    assert vals[3] == {"a": "da", "c": "dc"}         # NULL map → defaults


def test_rename_keys_struct_map_array(spark):
    # key-mode Mapper inside dict/list fields (chomper/processors.py:302-316)
    df = _nested_df(spark)
    out = pipe(
        df,
        fp.rename_keys("job", {"name": "title"}),
        fp.rename_keys("job.company", {"name": "company_name"}),
        fp.rename_keys("friends", {"name": "nick"}),
        fp.rename_keys("props", {"a": "alpha"}),
    )
    jt = out.schema["job"].dataType
    assert jt.fieldNames() == ["title", "company"]
    assert jt["company"].dataType.fieldNames() == ["company_name", "city"]
    assert out.schema["friends"].dataType.elementType.fieldNames() == ["nick"]
    vals = {r["id"]: r for r in out.collect()}
    assert vals[1]["job"]["title"] == "Ada"
    assert vals[1]["job"]["company"]["company_name"] == "Good Corp"
    assert vals[1]["friends"][0]["nick"] == "f1"
    assert vals[1]["props"] == {"alpha": "1"}
    assert vals[3]["job"] is None and vals[3]["props"] is None


def test_path_exists(spark):
    df = _nested_df(spark)
    got = {r["id"]: r["e"] for r in df.select("id", fp.path_exists("job.company.city").alias("e")).collect()}
    assert got == {1: True, 2: False, 3: False}


def test_for_fields_multi_path_selector(spark):
    # Selector routing a processor at several fields (chomper/items.py:244-273)
    df = _nested_df(spark)
    out = pipe(df, fp.for_fields(["job.name", "friends[0].name"], lambda c: F.upper(c)))
    vals = {r["id"]: r for r in out.collect()}
    assert vals[1]["job"]["name"] == "ADA"
    assert vals[1]["friends"][0]["name"] == "F1"
    assert vals[2]["job"]["name"] is None  # NULL skipped per path
    assert vals[3]["job"] is None


def test_fields_plan_stays_codegen(spark):
    # no Python evaluation anywhere in the nested-path machinery
    df = pipe(
        _nested_df(spark),
        fp.nested_defaults("job.company", {"city": "n/a"}),
        fp.rename_keys("friends", {"name": "nick"}),
        fp.set_path("friends[0].nick", F.lit("x")),
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_map_deep_path_raises(spark):
    df = _nested_df(spark)
    with pytest.raises(Exception, match="FINAL path segment|cannot"):
        pipe(df, fp.set_path("props.a.b", "x"))


def test_drop_path_under_array_index_raises_clearly(spark):
    df = _nested_df(spark)
    with pytest.raises(NotImplementedError, match="array index"):
        pipe(df, fp.drop_path("friends[0].name"))
    with pytest.raises(NotImplementedError, match="array index"):
        pipe(df, fp.nested_defaults("friends[0]", {"brand_new": "x"}))
    # defaulting EXISTING keys under an index is fine
    out = pipe(df, fp.nested_defaults("friends[0]", {"name": "anon"}))
    assert out.filter("id = 1").collect()[0]["friends"][0]["name"] == "f1"
    # and removing a MAP key under an index is fine too — the element
    # schema is unchanged, only that element's map contents shrink
    df2 = spark.createDataFrame(
        [(1, [("f1", {"a": "1", "b": "2"}), ("f2", {"a": "9"})])],
        "id int, friends array<struct<name:string, props:map<string,string>>>",
    )
    out2 = pipe(df2, fp.drop_path("friends[0].props.a")).collect()[0]
    assert out2["friends"][0]["props"] == {"b": "2"}
    assert out2["friends"][1]["props"] == {"a": "9"}  # other elements untouched
