"""Pair curation + shard manifest invariants (operators/pairs.py,
operators/packing.py::shard_manifest). Oracle parity for the registered
queries is covered by scripts/check_oracles.py / the driver gate; these
pin the operator-level contracts the SQL compare can't express."""

import pyspark.sql.functions as F
import pytest

from crawlee_spark.operators.packing import shard_manifest
from crawlee_spark.operators.pairs import anchor_stats, filter_pairs


@pytest.fixture(scope="module")
def pairs(spark):
    rows = [
        # image_id, w, h, fmt, caption
        ("a", 512, 512, "jpeg", "a clean caption here"),       # kept
        ("b", 32, 512, "jpeg", "tiny width"),                  # too-small
        ("c", 2000, 100, "png", "panorama strip here"),        # bad-aspect
        ("d", 512, 512, "gif", "animated thing"),              # bad-format
        ("e", 512, 512, "png", "one"),                         # caption-short
        ("f", 512, 512, "png", " ".join(["w"] * 100)),         # caption-long
        ("g", 63, 63, "gif", "x"),                             # too-small wins
        ("h", 512, 512, "png", "   "),                         # blank -> short
    ]
    return spark.createDataFrame(
        rows, "image_id string, w int, h int, fmt string, caption string")


def test_filter_pairs_reasons_and_priority(pairs):
    got = {
        r["image_id"]: (r["reject_reason"], r["kept"], r["n_tokens"])
        for r in filter_pairs(pairs).collect()
    }
    assert got["a"] == (None, True, 4)
    assert got["b"][0] == "too-small"
    assert got["c"][0] == "bad-aspect"
    assert got["d"][0] == "bad-format"
    assert got["e"][0] == "caption-short"
    assert got["f"][0] == "caption-long"
    # priority: the size gate fires before format/caption gates
    assert got["g"][0] == "too-small"
    # blank caption counts 0 tokens (not 1 from splitting "")
    assert got["h"] == ("caption-short", False, 0)
    assert not any(v[1] for k, v in got.items() if k != "a")


def test_anchor_stats_counts_and_tiebreak(spark):
    links = spark.createDataFrame(
        [("u1", "buy now"), ("u1", "buy now"), ("u1", "cheap"),
         ("u1", "zzz"),  # count 1, lexicographically greatest
         ("u2", "b"), ("u2", "a")],  # tie on count -> greater anchor wins
        "url string, anchor string",
    )
    got = {r["url"]: r for r in anchor_stats(links).collect()}
    assert got["u1"]["n_links"] == 4
    assert got["u1"]["n_anchors"] == 3
    assert got["u1"]["top_anchor"] == "buy now"  # count 2 beats count-1 'zzz'
    assert got["u2"]["n_links"] == 2
    assert got["u2"]["top_anchor"] == "b"


def test_shard_manifest_invariants(spark):
    n = 200
    df = spark.createDataFrame(
        [(f"k{i:04d}", 100 + i) for i in range(n)],
        "image_id string, est_bytes long",
    )
    out = shard_manifest(
        df, key_col="image_id", bytes_col="est_bytes",
        num_buckets=4, samples_per_shard=8,
    ).collect()
    assert len(out) == n
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r["shard_id"], []).append(r)
        assert r["shard_id"] == r["bucket"] * (1 << 20) + (
            r["shard_id"] % (1 << 20))
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["image_id"])
        # capacity bound + dense in-shard indexes + exact tar offsets
        assert len(rows) <= 8
        assert [r["sample_idx"] for r in rows] == list(range(len(rows)))
        off = 0
        for r in rows:
            assert r["byte_offset"] == off
            off += r["est_bytes"]
    # only the LAST shard of a bucket may be underfull
    for b in {r["bucket"] for r in out}:
        shards = sorted(s for s in by_shard if s >> 20 == b)
        for s in shards[:-1]:
            assert len(by_shard[s]) == 8


def test_shard_manifest_stable_under_repartition(spark):
    df = spark.createDataFrame(
        [(f"k{i}", 10 * i + 1) for i in range(60)],
        "image_id string, est_bytes long",
    )
    a = shard_manifest(df, "image_id", "est_bytes", 4, 8)
    b = shard_manifest(df.repartition(7), "image_id", "est_bytes", 4, 8)
    key = lambda r: r["image_id"]  # noqa: E731
    assert sorted(a.collect(), key=key) == sorted(b.collect(), key=key)


def test_write_webdataset_roundtrip_and_exact_offsets(spark, tmp_path):
    """The written tar is byte-deterministic, reads back with stdlib
    tarfile, and the manifest's byte_offset equals each sample's first
    header offset inside the shard (tar_sample_bytes fed as bytes_col)."""
    import tarfile

    from crawlee_spark.operators.packing import (
        shard_manifest,
        tar_sample_bytes,
        write_webdataset,
    )

    rows = [
        (f"img{i:03d}", bytes([i % 251]) * (i * 37 % 1500), f"caption {i} é")
        for i in range(40)
    ] + [("imgnull", b"", None)]  # empty image + NULL caption
    df = spark.createDataFrame(rows, "image_id string, bytes binary, caption string")
    sized = df.withColumn("est_bytes", tar_sample_bytes("bytes", "caption"))
    man = shard_manifest(sized, key_col="image_id", bytes_col="est_bytes",
                         num_buckets=2, samples_per_shard=8)

    out_dir = str(tmp_path / "wds")
    receipts = {r["shard_id"]: r for r in write_webdataset(
        man, out_dir, key_col="image_id",
        entries={"jpg": "bytes", "txt": "caption"}).collect()}

    by_key = {r[0]: r for r in rows}
    man_rows = man.collect()
    assert {r["shard_id"] for r in man_rows} == set(receipts)
    n_checked = 0
    for shard_id, rec in receipts.items():
        members = {}
        with tarfile.open(rec["path"]) as tf:
            for ti in tf.getmembers():
                members[ti.name] = (ti.offset, tf.extractfile(ti).read())
        shard_rows = [r for r in man_rows if r["shard_id"] == shard_id]
        assert rec["n_samples"] == len(shard_rows)
        for r in shard_rows:
            k = r["image_id"]
            img, cap = by_key[k][1], by_key[k][2]
            # content round-trips (NULL caption -> empty entry)
            assert members[f"{k}.jpg"][1] == img
            assert members[f"{k}.txt"][1] == (cap or "").encode("utf-8")
            # manifest offset == the sample's FIRST entry header offset
            first = min(members[f"{k}.jpg"][0], members[f"{k}.txt"][0])
            assert r["byte_offset"] == first, (k, r["byte_offset"], first)
            n_checked += 1
    assert n_checked == len(rows)

    # re-running the export writes byte-identical shards
    import hashlib, os
    before = {p: hashlib.md5(open(os.path.join(out_dir, p), "rb").read()).hexdigest()
              for p in os.listdir(out_dir)}
    write_webdataset(man, out_dir, key_col="image_id",
                     entries={"jpg": "bytes", "txt": "caption"}).collect()
    after = {p: hashlib.md5(open(os.path.join(out_dir, p), "rb").read()).hexdigest()
             for p in os.listdir(out_dir)}
    assert before == after


def test_read_webdataset_roundtrip(spark, tmp_path):
    """Writer -> reader round-trip: every sample comes back with its
    payloads; NULL caption round-trips as empty entry -> b''."""
    from crawlee_spark.operators.packing import (
        read_webdataset,
        shard_manifest,
        tar_sample_bytes,
        write_webdataset,
    )

    rows = [(f"k{i:02d}", bytes([65 + i % 26]) * (i * 11 % 700),
             f"cap {i}" if i % 7 else None) for i in range(30)]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, caption string")
    man = shard_manifest(
        df.withColumn("est_bytes", tar_sample_bytes("bytes", "caption")),
        key_col="image_id", bytes_col="est_bytes",
        num_buckets=2, samples_per_shard=8)
    out_dir = str(tmp_path / "wds")
    write_webdataset(man, out_dir, key_col="image_id",
                     entries={"jpg": "bytes", "txt": "caption"}).collect()

    back = {r["key"]: r for r in read_webdataset(spark, out_dir).collect()}
    assert set(back) == {k for k, _, _ in rows}
    for k, img, cap in rows:
        assert bytes(back[k]["jpg"]) == img
        assert bytes(back[k]["txt"]) == (cap or "").encode()
    # file = unit of parallelism: shard_path column matches written files
    import os
    assert {os.path.basename(r["shard_path"]) for r in back.values()} == \
        set(os.listdir(out_dir))


def test_write_webdataset_long_keys_pax_and_streamed(spark, tmp_path):
    """Keys whose entry names exceed ustar's 100-byte cap must fall back to
    pax (per shard, decided before writing) instead of crashing mid-export;
    the long-name tar still round-trips and re-runs byte-identically."""
    import hashlib
    import os
    import tarfile

    from crawlee_spark.operators.packing import (
        read_webdataset,
        shard_manifest,
        tar_sample_bytes,
        write_webdataset,
    )

    long_key = "k" + "x" * 120
    rows = [(long_key, b"LONG", "cap long"), ("short", b"SHORT", "cap s")]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, caption string")
    man = shard_manifest(
        df.withColumn("est_bytes", tar_sample_bytes("bytes", "caption")),
        key_col="image_id", bytes_col="est_bytes",
        num_buckets=1, samples_per_shard=8)
    out_dir = str(tmp_path / "wds_long")
    rec = write_webdataset(man, out_dir, key_col="image_id",
                           entries={"jpg": "bytes", "txt": "caption"}).collect()
    assert rec and all(r["n_samples"] > 0 for r in rec)
    with tarfile.open(rec[0]["path"]) as tf:
        names = {ti.name for ti in tf.getmembers() if ti.isreg()}
    assert f"{long_key}.jpg" in names
    back = {r["key"]: r for r in read_webdataset(spark, out_dir).collect()}
    assert bytes(back[long_key]["jpg"]) == b"LONG"
    # determinism holds through the pax path too
    h = lambda: {p: hashlib.md5(open(os.path.join(out_dir, p), "rb").read())
                 .hexdigest() for p in os.listdir(out_dir)}  # noqa: E731
    before = h()
    write_webdataset(man, out_dir, key_col="image_id",
                     entries={"jpg": "bytes", "txt": "caption"}).collect()
    assert h() == before


def test_read_webdataset_skips_non_regular_members(spark, tmp_path):
    """Externally produced shards may contain directory/symlink members —
    the reader must skip them (extractfile returns None), not crash."""
    import io
    import os
    import tarfile

    out_dir = str(tmp_path / "wds_ext")
    os.makedirs(out_dir)
    with tarfile.open(os.path.join(out_dir, "shard-0000000000.tar"), "w") as tf:
        d = tarfile.TarInfo("somedir.jpg")  # dir whose NAME matches an ext
        d.type = tarfile.DIRTYPE
        tf.addfile(d)
        ln = tarfile.TarInfo("alink.txt")
        ln.type = tarfile.SYMTYPE
        ln.linkname = "elsewhere"
        tf.addfile(ln)
        ti = tarfile.TarInfo("real.jpg")
        ti.size = 4
        tf.addfile(ti, io.BytesIO(b"DATA"))
    from crawlee_spark.operators.packing import read_webdataset

    rows = read_webdataset(spark, out_dir).collect()
    assert {r["key"] for r in rows} == {"real"}
    assert bytes(rows[0]["jpg"]) == b"DATA"
