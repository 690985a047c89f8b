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
