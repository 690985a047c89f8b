"""applyInPandasWithState politeness gate: per-host spacing state that
survives micro-batches (streaming analog of sameDomainDelaySecs)."""

from __future__ import annotations

from crawlee_spark.streaming.stateful import politeness_gate


def _run_batch(spark, src, out, ckpt):
    stream = (
        spark.readStream.format("csv")
        .schema("host string, url string, ts long")
        .load(str(src))
    )
    q = (
        politeness_gate(stream, delay_secs=10, output_mode="append")
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_stateful_gate_spaces_hosts_across_batches(spark, tmp_path):
    src = tmp_path / "reqs"
    src.mkdir()
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    # batch 1: 3 requests for a.com at t=0,5,20 and one for b.net
    (src / "b1.csv").write_text(
        "a.com,https://a.com/1,0\n"
        "a.com,https://a.com/2,5\n"
        "a.com,https://a.com/3,20\n"
        "b.net,https://b.net/1,0\n"
    )
    _run_batch(spark, src, out, ckpt)
    # batch 2 arrives later: the gate must remember a.com's next slot (t=30)
    (src / "b2.csv").write_text(
        "a.com,https://a.com/4,25\n"
        "a.com,https://a.com/5,31\n"
    )
    _run_batch(spark, src, out, ckpt)

    rows = {r["url"]: r["allowed"] for r in spark.read.parquet(str(out)).collect()}
    assert rows["https://a.com/1"] is True    # t=0 admitted, next slot t=10
    assert rows["https://a.com/2"] is False   # t=5 < 10 deferred
    assert rows["https://a.com/3"] is True    # t=20 admitted, next slot t=30
    assert rows["https://b.net/1"] is True    # independent host state
    assert rows["https://a.com/4"] is False   # t=25 < 30 (state crossed batches)
    assert rows["https://a.com/5"] is True    # t=31 >= 30
