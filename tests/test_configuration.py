"""Configuration env-var binding (crawlee_spark/configuration.py;
reference packages/core/src/configuration.ts): resolution precedence
env > instance option > caller default > DEFAULTS, the boolean/integer
cast table, the global instance, and CrawlConfig materialization."""

from __future__ import annotations

import pytest

from crawlee_spark.configuration import DEFAULTS, Configuration


def test_defaults_table():
    c = Configuration(env={})
    assert c.get("purge_on_start") is True
    assert c.get("default_dataset_id") == "default"
    assert c.get("input_key") == "INPUT"
    assert c.get("persist_state_interval_millis") == 60_000
    assert c.get("num_buckets") == 32


def test_precedence_env_over_option_over_default():
    c = Configuration({"num_buckets": 64},
                      env={"CRAWLEE_SPARK_NUM_BUCKETS": "128"})
    assert c.get("num_buckets") == 128          # env wins
    c2 = Configuration({"num_buckets": 64}, env={})
    assert c2.get("num_buckets") == 64          # option beats defaults
    assert c2.get("max_retries", 7) == 7        # caller default beats DEFAULTS
    assert c2.get("max_retries") == 3           # DEFAULTS last


def test_casting_booleans_and_numbers():
    # '0', 'false', '' are falsy (configuration.ts:341)
    for raw, expect in [("0", False), ("false", False), ("", False),
                        ("FALSE", False), ("1", True), ("true", True),
                        ("yes", True)]:
        c = Configuration(env={"CRAWLEE_PURGE_ON_START": raw})
        assert c.get("purge_on_start") is expect, raw
    c = Configuration(env={"CRAWLEE_MEMORY_MBYTES": "4096",
                           "CRAWLEE_AVAILABLE_MEMORY_RATIO": "0.5"})
    assert c.get("memory_mbytes") == 4096
    assert c.get("available_memory_ratio") == 0.5
    # empty NON-boolean var = unset, falls through to defaults
    c = Configuration(env={"CRAWLEE_SPARK_NUM_BUCKETS": ""})
    assert c.get("num_buckets") == 32


def test_unknown_keys_raise():
    with pytest.raises(KeyError):
        Configuration({"headless": True})       # browser var: no analog
    with pytest.raises(KeyError):
        Configuration().get("no_such_option")
    with pytest.raises(KeyError):
        Configuration().set("no_such_option", 1)


def test_set_and_reset():
    c = Configuration(env={})
    c.set("max_retries", 5)
    assert c.get("max_retries") == 5
    c.set("max_retries", None)                  # None resets (reference set)
    assert c.get("max_retries") == 3


def test_to_crawl_config_binding_and_overrides():
    c = Configuration(env={"CRAWLEE_SPARK_NUM_BUCKETS": "16",
                           "CRAWLEE_SPARK_USE_BLOOM": "true",
                           "CRAWLEE_SPARK_URLSEEN_KIND": "cuckoo",
                           "CRAWLEE_SPARK_TRACK_SESSIONS": "1"})
    cfg = c.to_crawl_config()
    assert cfg.num_buckets == 16 and cfg.use_bloom is True
    assert cfg.urlseen_kind == "cuckoo" and cfg.track_sessions is True
    # keyword overrides (code-level API) win over the config layer
    cfg2 = c.to_crawl_config(num_buckets=8)
    assert cfg2.num_buckets == 8


def test_storage_path_and_global_instance():
    c = Configuration(env={"CRAWLEE_STORAGE_DIR": "/tmp/crawlee-x"})
    assert c.storage_path("datasets", "default") == \
        "/tmp/crawlee-x/datasets/default"
    Configuration.reset_global_configuration()
    g1 = Configuration.get_global_configuration()
    assert Configuration.get_global_configuration() is g1
    Configuration.reset_global_configuration()
    assert Configuration.get_global_configuration() is not g1
    # every DEFAULTS key resolves on a bare instance
    bare = Configuration(env={})
    for k in DEFAULTS:
        assert bare.get(k) == DEFAULTS[k]


def test_open_storages_resolution_and_purge(spark, tmp_path):
    """open_dataset/open_key_value_store resolve roots from the config and
    purge the DEFAULT storage once per process under purge_on_start; named
    storages are never purged (storages/utils.ts::purgeDefaultStorages)."""
    from crawlee_spark.store import dataset as ds

    c = Configuration({"storage_dir": str(tmp_path / "storage")}, env={})
    kv = ds.open_key_value_store(config=c)
    kv.set_value("probe", {"v": 1})
    named = ds.open_key_value_store("keep", config=c)
    named.set_value("probe", {"v": 2})
    assert kv.root == str(tmp_path / "storage/key_value_stores/default")

    # same process: default store NOT re-purged on re-open
    assert ds.open_key_value_store(config=c).get_value("probe") == {"v": 1}

    # simulate a fresh process: purge registry cleared -> default purged,
    # named survives
    ds._PURGED_ROOTS.clear()
    assert ds.open_key_value_store(config=c).get_value("probe") is None
    assert ds.open_key_value_store("keep", config=c).get_value("probe") == \
        {"v": 2}

    # purge_on_start=False never purges
    ds._PURGED_ROOTS.clear()
    c2 = Configuration({"storage_dir": str(tmp_path / "storage"),
                        "purge_on_start": False}, env={})
    ds.open_key_value_store(config=c2).set_value("probe", {"v": 3})
    ds._PURGED_ROOTS.clear()
    assert ds.open_key_value_store(config=c2).get_value("probe") == {"v": 3}

    # dataset resolution + getInput
    d = ds.open_dataset(spark, "results", config=c)
    assert d.table.root == str(tmp_path / "storage/datasets/results")
    ds.open_key_value_store(config=c).set_value("INPUT", {"seeds": ["a"]})
    assert ds.get_input(config=c) == {"seeds": ["a"]}


def test_open_request_queue_resolution(spark, tmp_path):
    """open() CREATES the storage (RequestQueue.open contract) — the
    returned handle must be immediately usable, and re-opening adopts the
    existing table instead of recreating it."""
    from crawlee_spark.store import dataset as ds

    c = Configuration({"storage_dir": str(tmp_path / "s")}, env={})
    q = ds.open_request_queue(spark, "main", config=c, num_buckets=8)
    assert q.table.root == str(tmp_path / "s/request_queues/main")
    assert q.exists()
    batch = spark.createDataFrame(
        [("http://a.test/1", False, 0)],
        "url string, forefront boolean, depth int")
    assert q.add_requests(batch, step=0)["added"] == 1
    q2 = ds.open_request_queue(spark, "main", config=c)
    assert q2.counters()["total"] == 1 and q2.num_buckets == 8
