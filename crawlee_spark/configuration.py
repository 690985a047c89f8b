"""Configuration system: env-var binding with the reference's precedence.

Reference surface (``packages/core/src/configuration.ts``): a
``Configuration`` holds an options map; ``get(key, default)`` resolves
with the precedence **env var > instance option > caller default > class
DEFAULTS**, casting env strings per a BOOLEAN/INTEGER vars table
(``'0' | 'false' | ''`` are falsy — configuration.ts:340-343); a
process-global instance is reachable via ``get_global_configuration()``
(configuration.ts:394-404).

This module reproduces that resolution engine and binds it to THIS
engine's knobs. Two groups of keys:

- the reference's own storage/lifecycle vars (``CRAWLEE_STORAGE_DIR``,
  ``CRAWLEE_PURGE_ON_START``, default store ids, persist intervals) —
  same names, same defaults where the concept carries over;
- Spark-engine keys under ``CRAWLEE_SPARK_*`` (num_buckets, max_retries,
  URL-seen kind, ...) — the browser-runtime vars (headless/xvfb/chrome
  paths) have no analog here and are deliberately absent.

``to_crawl_config()`` materializes a ``CrawlConfig`` from the resolved
values, so `CRAWLEE_SPARK_NUM_BUCKETS=128 spark-submit job.py` tunes a
crawl with no code change — the reference's env-first ergonomics.
"""

from __future__ import annotations

import os
from typing import Any

ENV_MAP: dict[str, str] = {
    # reference names (configuration.ts ENV_MAP), storage/lifecycle subset
    "CRAWLEE_STORAGE_DIR": "storage_dir",
    "CRAWLEE_PURGE_ON_START": "purge_on_start",
    "CRAWLEE_PERSIST_STORAGE": "persist_storage",
    "CRAWLEE_DEFAULT_DATASET_ID": "default_dataset_id",
    "CRAWLEE_DEFAULT_KEY_VALUE_STORE_ID": "default_key_value_store_id",
    "CRAWLEE_DEFAULT_REQUEST_QUEUE_ID": "default_request_queue_id",
    "CRAWLEE_INPUT_KEY": "input_key",
    "CRAWLEE_PERSIST_STATE_INTERVAL_MILLIS": "persist_state_interval_millis",
    "CRAWLEE_SYSTEM_INFO_INTERVAL_MILLIS": "system_info_interval_millis",
    "CRAWLEE_MEMORY_MBYTES": "memory_mbytes",
    "CRAWLEE_AVAILABLE_MEMORY_RATIO": "available_memory_ratio",
    "CRAWLEE_LOG_LEVEL": "log_level",
    # Spark-engine keys (beyond-reference binding, CrawlConfig fields)
    "CRAWLEE_SPARK_NUM_BUCKETS": "num_buckets",
    "CRAWLEE_SPARK_MAX_RETRIES": "max_retries",
    "CRAWLEE_SPARK_USE_BLOOM": "use_bloom",
    "CRAWLEE_SPARK_URLSEEN_KIND": "urlseen_kind",
    "CRAWLEE_SPARK_SESSIONS_PER_BUCKET": "sessions_per_bucket",
    "CRAWLEE_SPARK_TRACK_SESSIONS": "track_sessions",
    "CRAWLEE_SPARK_MAX_STEPS": "max_steps",
    "CRAWLEE_SPARK_USER_AGENT": "user_agent",
    "CRAWLEE_SPARK_KEEP_FRAGMENT": "keep_fragment",
}

BOOLEAN_VARS = frozenset({
    "purge_on_start", "persist_storage", "use_bloom", "track_sessions",
    "keep_fragment",
})

INTEGER_VARS = frozenset({
    "persist_state_interval_millis", "system_info_interval_millis",
    "memory_mbytes", "num_buckets", "max_retries", "sessions_per_bucket",
    "max_steps",
})

FLOAT_VARS = frozenset({"available_memory_ratio"})

DEFAULTS: dict[str, Any] = {
    # reference DEFAULTS (configuration.ts:256-269), carried-over subset
    "storage_dir": "./storage",
    "purge_on_start": True,
    "persist_storage": True,
    "default_dataset_id": "default",
    "default_key_value_store_id": "default",
    "default_request_queue_id": "default",
    "input_key": "INPUT",
    "persist_state_interval_millis": 60_000,
    "system_info_interval_millis": 60_000,
    "available_memory_ratio": 0.25,
    # Spark-engine defaults (match CrawlConfig's dataclass defaults)
    "num_buckets": 32,
    "max_retries": 3,
    "use_bloom": False,
    "urlseen_kind": "bloom",
    "sessions_per_bucket": 4,
    "track_sessions": False,
    "max_steps": 10_000,
    "user_agent": "*",
    "keep_fragment": False,
}

_FALSY = {"0", "false", ""}  # configuration.ts:341

# every key the config layer knows: DEFAULTS keys plus env-bound keys that
# deliberately have no default (memory_mbytes, log_level — the reference's
# memoryMbytes/logLevel are also default-less)
KNOWN_OPTIONS = frozenset(DEFAULTS) | frozenset(ENV_MAP.values())


def _cast(key: str, value: str) -> Any:
    if key in BOOLEAN_VARS:
        return value.lower() not in _FALSY
    if key in INTEGER_VARS:
        return int(value)
    if key in FLOAT_VARS:
        return float(value)
    return value


class Configuration:
    """Options map + env resolution (env > option > default arg > DEFAULTS)."""

    _global: "Configuration | None" = None

    def __init__(self, options: dict[str, Any] | None = None,
                 env: dict[str, str] | None = None):
        unknown = set(options or {}) - KNOWN_OPTIONS
        if unknown:
            raise KeyError(f"unknown configuration option(s): {sorted(unknown)}")
        self._options: dict[str, Any] = dict(options or {})
        # injectable env for tests; live os.environ lookups otherwise (the
        # reference reads process.env at get() time, not construction time)
        self._env = env

    def _env_lookup(self, key: str) -> str | None:
        src = self._env if self._env is not None else os.environ
        found: str | None = None
        for var, opt in ENV_MAP.items():
            if opt == key:
                v = src.get(var)
                if v is not None:
                    found = v
                    if v != "":
                        break  # first non-empty wins across duplicate vars
        # the reference counts '' as a set-but-falsy value for BOOLEAN vars
        # (configuration.ts:341); for non-boolean keys an empty var is
        # treated as unset (casting '' to int/float is never meaningful)
        if found == "" and key not in BOOLEAN_VARS:
            return None
        return found

    def get(self, key: str, default: Any = None) -> Any:
        if key not in KNOWN_OPTIONS:
            raise KeyError(f"unknown configuration option: {key}")
        env_value = self._env_lookup(key)
        if env_value is not None:
            return _cast(key, env_value)
        if key in self._options:
            return self._options[key]
        if default is not None:
            return default
        return DEFAULTS.get(key)

    def set(self, key: str, value: Any = None) -> None:
        """Instance-level override; ``None`` resets (configuration.ts set)."""
        if key not in KNOWN_OPTIONS:
            raise KeyError(f"unknown configuration option: {key}")
        if value is None:
            self._options.pop(key, None)
        else:
            self._options[key] = value

    # -- engine integration --------------------------------------------------

    def to_crawl_config(self, **overrides: Any):
        """Materialize a ``CrawlConfig`` from the resolved values. Keyword
        overrides win over everything (they are the code-level API; env
        precedence applies to the CONFIG layer, matching the reference
        where crawler-constructor options are not Configuration keys)."""
        from crawlee_spark.engine import CrawlConfig

        bound = {
            "num_buckets": self.get("num_buckets"),
            "max_retries": self.get("max_retries"),
            "use_bloom": self.get("use_bloom"),
            "urlseen_kind": self.get("urlseen_kind"),
            "sessions_per_bucket": self.get("sessions_per_bucket"),
            "track_sessions": self.get("track_sessions"),
            "max_steps": self.get("max_steps"),
            "user_agent": self.get("user_agent"),
            "keep_fragment": self.get("keep_fragment"),
        }
        bound.update(overrides)
        return CrawlConfig(**bound)

    def storage_path(self, *parts: str) -> str:
        """Join under the resolved storage dir (memory-storage's
        ``CRAWLEE_STORAGE_DIR`` root)."""
        return os.path.join(self.get("storage_dir"), *parts)

    # -- global instance (configuration.ts:394-404) --------------------------

    @classmethod
    def get_global_configuration(cls) -> "Configuration":
        if cls._global is None:
            cls._global = cls()
        return cls._global

    @classmethod
    def reset_global_configuration(cls) -> None:
        cls._global = None
