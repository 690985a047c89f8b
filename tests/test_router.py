"""Router label dispatch (``packages/core/src/router.ts:32-55``):
per-label handlers, default fallback, missing-route throw, duplicate
registration throw."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawlee_spark.operators.router import MissingRouteError, Router


def _pages(spark):
    return spark.createDataFrame(
        [
            ("https://a.com/list", "LIST", 10),
            ("https://a.com/item/1", "ITEM", 20),
            ("https://a.com/item/2", "ITEM", 30),
            ("https://a.com/other", None, 40),
        ],
        "url string, label string, val int",
    )


def test_dispatch_per_label_and_default(spark):
    r = Router()
    r.add_handler("LIST", lambda df: df.select("url", F.lit("list").alias("kind")))
    r.add_handler("ITEM", lambda df: df.select("url", F.lit("item").alias("kind")))
    r.add_default_handler(lambda df: df.select("url", F.lit("dflt").alias("kind")))
    got = {(x["url"], x["kind"]) for x in r(_pages(spark)).collect()}
    assert got == {
        ("https://a.com/list", "list"),
        ("https://a.com/item/1", "item"),
        ("https://a.com/item/2", "item"),
        ("https://a.com/other", "dflt"),
    }


def test_missing_route_raises(spark):
    r = Router()
    r.add_handler("LIST", lambda df: df.select("url"))
    with pytest.raises(MissingRouteError):
        r(_pages(spark))


def test_missing_route_non_strict_drops(spark):
    r = Router()
    r.add_handler("LIST", lambda df: df.select("url"))
    out = r(_pages(spark), strict=False)
    assert [x["url"] for x in out.collect()] == ["https://a.com/list"]


def test_duplicate_registration_raises():
    r = Router()
    r.add_handler("A", lambda df: df)
    with pytest.raises(ValueError):
        r.add_handler("A", lambda df: df)
    r.add_default_handler(lambda df: df)
    with pytest.raises(ValueError):
        r.add_default_handler(lambda df: df)


def test_decorator_and_union_missing_columns(spark):
    r = Router()

    @r.handler("LIST")
    def list_h(df):
        return df.select("url", F.lit(1).alias("n_items"))

    @r.handler("ITEM")
    def item_h(df):
        return df.select("url", (F.col("val") * 2).alias("price"))

    out = r(_pages(spark).filter(F.col("label").isNotNull()))
    assert set(out.columns) == {"url", "n_items", "price"}
    rows = {x["url"]: (x["n_items"], x["price"]) for x in out.collect()}
    assert rows["https://a.com/list"] == (1, None)
    assert rows["https://a.com/item/1"] == (None, 40)
