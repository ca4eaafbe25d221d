from pyspark.sql import functions as F

from local_vectordb_spark.operators import crud


def _df(spark, rows, schema="id long, name string, val long"):
    return spark.createDataFrame(rows, schema)


def test_upsert_update_insert_preserve(spark):
    base = _df(spark, [(1, "a", 10), (2, "b", 20)])
    updates = _df(spark, [(2, None, 99), (3, "c", 30)])
    out = {r["id"]: (r["name"], r["val"]) for r in crud.upsert(base, updates, "id").collect()}
    assert out[1] == ("a", 10)      # untouched
    assert out[2] == ("b", 99)      # val updated, None name keeps base
    assert out[3] == ("c", 30)      # inserted


def test_delete_keys(spark):
    base = _df(spark, [(1, "a", 1), (2, "b", 2), (3, "c", 3)])
    keys = spark.createDataFrame([(2,)], "id long")
    left = sorted(r["id"] for r in crud.delete_keys(base, keys, "id").collect())
    assert left == [1, 3]


def test_cascade_delete(spark):
    children = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20)], "cid long, parent_id long"
    )
    deleted = spark.createDataFrame([(10,)], "pid long")
    left = sorted(
        r["cid"]
        for r in crud.cascade_delete(children, deleted, "parent_id", "pid").collect()
    )
    assert left == [3]


def test_fk_violations(spark):
    child = spark.createDataFrame([(1, 10), (2, 99)], "cid long, fk long")
    parent = spark.createDataFrame([(10,)], "pk long")
    bad = crud.fk_violations(child, parent, "fk", "pk").collect()
    assert [r["cid"] for r in bad] == [2]


def test_reject_duplicates_split(spark):
    existing = _df(spark, [(1, "a", 1)])
    incoming = _df(spark, [(1, "dup", 9), (2, "new", 2)])
    accepted, rejected = crud.reject_duplicates(existing, incoming, "id")
    assert [r["id"] for r in accepted.collect()] == [2]
    assert [r["id"] for r in rejected.collect()] == [1]


def test_truncate_keeps_schema(spark):
    base = _df(spark, [(1, "a", 1)])
    out = crud.truncate(base)
    assert out.count() == 0
    assert out.schema == base.schema
