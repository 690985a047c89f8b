"""Dataset / KeyValueStore / RequestList (SURVEY.md §2.1-2.2 sinks+sources)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from crawlee_spark.sources import RequestList, requests_from_manifest
from crawlee_spark.store.dataset import Dataset, KeyValueStore


def test_dataset_push_get_order(spark, tmp_path):
    ds = Dataset(spark, str(tmp_path / "ds"))
    ds.push_data(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"))
    ds.push_data(spark.createDataFrame([(3, "c")], "k int, v string"))
    assert ds.item_count() == 3
    rows = ds.get_data().collect()
    assert [r["k"] for r in rows] == [1, 2, 3]  # insertion order
    desc = ds.get_data(desc=True, limit=2).collect()
    assert [r["k"] for r in desc] == [3, 2]
    off = ds.get_data(offset=1, limit=1, fields=["v"]).collect()
    assert [r["v"] for r in off] == ["b"]


def test_dataset_export(spark, tmp_path):
    ds = Dataset(spark, str(tmp_path / "ds"))
    ds.push_data(spark.createDataFrame([(1, 'say "hi"'), (2, "x,y")], "k int, v string"))
    jp, cp = str(tmp_path / "out.json"), str(tmp_path / "out.csv")
    ds.export_to_json(jp)
    ds.export_to_csv(cp)
    data = json.loads(open(jp).read())
    assert data == [{"k": 1, "v": 'say "hi"'}, {"k": 2, "v": "x,y"}]
    lines = open(cp).read().splitlines()
    assert lines[0] == "k,v"
    assert lines[1] == '1,"say ""hi"""'
    assert lines[2] == '2,"x,y"'


def test_dataset_export_json_bytes_and_empty(spark, tmp_path):
    """The streamed export must produce the SAME bytes as
    json.dumps(rows, indent=2) (the pre-streaming format), incl. empty."""
    ds = Dataset(spark, str(tmp_path / "ds"))
    rows = [(i, f"v{i}") for i in range(7)]
    ds.push_data(spark.createDataFrame(rows, "k int, v string"))
    jp = str(tmp_path / "out.json")
    ds.export_to_json(jp)
    expect = json.dumps([{"k": k, "v": v} for k, v in rows], indent=2)
    assert open(jp).read() == expect

    empty = Dataset(spark, str(tmp_path / "ds2"))
    empty.push_data(spark.createDataFrame([], "k int, v string"))
    ep = str(tmp_path / "empty.json")
    empty.export_to_json(ep)
    assert open(ep).read() == "[]"


def test_dataset_export_distributed(spark, tmp_path):
    ds = Dataset(spark, str(tmp_path / "ds"))
    ds.push_data(spark.createDataFrame([(i, f"v{i}") for i in range(20)],
                                       "k int, v string"))
    out = str(tmp_path / "parts")
    ds.export_distributed(out, fmt="json")
    back = spark.read.json(out)
    assert back.count() == 20
    assert {r["k"] for r in back.collect()} == set(range(20))


def test_dataset_push_data_seq_dense_across_partitions(spark, tmp_path):
    """seq must be a dense 0..N-1 insertion index even when the input frame
    has many partitions (incl. empty ones)."""
    ds = Dataset(spark, str(tmp_path / "ds"))
    df = spark.range(0, 13, 1, 8).select(F.col("id").cast("int").alias("k"))
    assert ds.push_data(df) == 13
    got = ds.table.read().orderBy("seq").collect()
    assert [r["seq"] for r in got] == list(range(13))
    assert sorted(r["k"] for r in got) == list(range(13))
    # second batch continues the dense index at item_count
    assert ds.push_data(spark.createDataFrame([(99,)], "k int")) == 1
    assert ds.table.read().agg(F.max("seq")).first()[0] == 13


def test_dataset_reduce(spark, tmp_path):
    ds = Dataset(spark, str(tmp_path / "ds"))
    ds.push_data(spark.createDataFrame([(i,) for i in range(10)], "k int"))
    out = ds.reduce([F.sum("k").alias("s"), F.count("*").alias("n")])
    assert out == {"s": 45, "n": 10}


def test_kv_store(tmp_path):
    kv = KeyValueStore(str(tmp_path / "kv"))
    kv.set_value("INPUT", {"maxRequestsPerCrawl": 10})
    kv.set_value("state", [1, 2, 3])
    assert kv.get_value("INPUT") == {"maxRequestsPerCrawl": 10}
    assert kv.get_value("missing", "dflt") == "dflt"
    assert kv.keys() == ["INPUT", "state"]
    kv.set_value("state", None)  # None deletes (reference setValue semantics)
    assert kv.keys() == ["INPUT"]


def test_request_list_dedup_and_keep_duplicates(spark):
    srcs = [
        "https://example.com/1",
        "https://example.com/1#frag",
        {"url": "https://example.com/2", "forefront": True},
        "not a url",
    ]
    rl = RequestList.open(spark, srcs, num_buckets=4)
    assert rl.count() == 2  # fragment dup collapses, invalid dropped
    rows = {r["unique_key"]: r for r in rl.to_seeds().collect()}
    assert rows["https://example.com/2"]["forefront"] is True

    rl_dup = RequestList.open(spark, ["https://example.com/1"] * 3,
                              num_buckets=4, keep_duplicate_urls=True)
    assert rl_dup.count() == 3  # keepDuplicateUrls (request_list.ts:712-714)


def test_requests_from_manifest(spark, tmp_path):
    p = tmp_path / "manifest.txt"
    p.write_text(
        "intro https://a.com/x, https://b.net/y trailing\n"
        "no urls here\n"
        'quoted "https://c.org/z" done\n'
    )
    got = sorted(r["url"] for r in requests_from_manifest(spark, str(p)).collect())
    assert got == ["https://a.com/x", "https://b.net/y", "https://c.org/z"]


def test_kv_store_keys_never_collide(tmp_path):
    kv = KeyValueStore(str(tmp_path / "kv"))
    kv.set_value("a/b", 1)
    kv.set_value("a_b", 2)
    kv.set_value("a b", 3)
    assert kv.get_value("a/b") == 1
    assert kv.get_value("a_b") == 2
    assert kv.get_value("a b") == 3
    assert kv.keys() == ["a b", "a/b", "a_b"]  # decoded, all distinct


def test_csv_export_quotes_carriage_return(spark, tmp_path):
    ds = Dataset(spark, str(tmp_path / "ds"))
    ds.push_data(spark.createDataFrame([(1, "x\ry")], "k int, v string"))
    cp = str(tmp_path / "out.csv")
    ds.export_to_csv(cp)
    body = open(cp, newline="").read()  # raw: no universal-newline mangling
    assert '"x\ry"' in body  # bare CR must be quoted (RFC 4180)


def test_get_data_prunes_segments_by_seq_range(spark, tmp_path):
    ds = Dataset(spark, str(tmp_path / "ds"))
    for b in range(4):  # 4 segments x 5 rows, seq 0..19
        ds.push_data(spark.createDataFrame(
            [(b * 5 + i,) for i in range(5)], "k int"))
    got = [r["k"] for r in ds.get_data(offset=6, limit=3).collect()]
    assert got == [6, 7, 8]
    # the pruned plan reads only the one overlapping segment
    pruned = ds._read_seq_range(6, 9)
    assert pruned.count() == 5  # exactly segment 2's rows (seq 5..9)
    # desc + offset spans a segment boundary
    got_desc = [r["k"] for r in ds.get_data(offset=1, limit=4, desc=True).collect()]
    assert got_desc == [18, 17, 16, 15]
    # beyond-the-end offset: empty frame with the right schema
    assert ds.get_data(offset=100, limit=5).count() == 0


def test_kv_store_reads_legacy_filenames(tmp_path):
    # a store written by the pre-encoding scheme (non-alnum -> '_') must
    # still read, and gets migrated to the collision-free name on touch
    root = tmp_path / "kv"
    root.mkdir()
    (root / "crawl_stats.json").write_text('{"n": 7}')  # legacy 'crawl/stats'
    kv = KeyValueStore(str(root))
    assert kv.get_value("crawl/stats") == {"n": 7}
    assert kv.get_value("crawl/stats") == {"n": 7}  # after migration too
    assert "crawl/stats" in kv.keys()
