"""Custom stateful streaming operator: per-host politeness gate via
``applyInPandasWithState``.

The batch engine enforces politeness set-based per superstep; in the
Structured Streaming mode, spacing *within* a continuous request stream
needs per-key state that outlives micro-batches — exactly the
``applyInPandasWithState`` shape (the brief's "custom stateful operators"
path). State per host: ``(next_allowed_at, emitted_count)``; requests whose
logical timestamp falls before the host's next allowed slot are deferred
(emitted with ``allowed = false``) and do NOT advance the slot.

This is the streaming analog of ``operators/politeness.py``
(``sameDomainDelaySecs``, ``basic-crawler.ts:1111-1138``): a host's
admitted fetches are spaced >= ``delay_secs`` apart in event time.

Works on any stream keyed by host with an epoch-seconds ``ts`` column;
tested via a file stream + memory sink (tests/test_streaming_stateful.py).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "host string, url string, ts long, allowed boolean"
STATE_SCHEMA = "next_allowed_at long, emitted bigint"


def make_gate(delay_secs: float):
    """Build the applyInPandasWithState function for a given host delay.

    Determinism: a big host group arrives as SEVERAL pandas chunks (Arrow
    batch size), so the chunks are concatenated before the one global
    (ts, url) sort — sorting per chunk would make admit/defer decisions
    depend on chunk boundaries. Memory = one host's rows in one
    micro-batch (politeness keys are per-host, bounded by the batch).

    Spacing: ``ts`` is integer event-time seconds, so the next allowed
    slot is ``ceil(ts + delay_secs)`` — a fractional delay rounds UP
    (never silently down to 0), keeping the documented ">= delay_secs
    apart" contract."""
    import math

    def gate(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (host,) = key
        if state.exists:
            next_allowed, emitted = state.get
        else:
            next_allowed, emitted = 0, 0
        rows: list[dict[str, Any]] = []
        chunks = [pdf for pdf in pdfs if len(pdf)]
        batch = (
            pd.concat(chunks, ignore_index=True) if chunks
            else pd.DataFrame(columns=["host", "url", "ts"])
        )
        for _, r in batch.sort_values(["ts", "url"]).iterrows():
            ts = int(r["ts"])
            if ts >= next_allowed:
                rows.append({"host": host, "url": r["url"], "ts": ts, "allowed": True})
                next_allowed = math.ceil(ts + delay_secs)
                emitted += 1
            else:
                rows.append({"host": host, "url": r["url"], "ts": ts, "allowed": False})
        state.update((next_allowed, emitted))
        yield pd.DataFrame(rows, columns=["host", "url", "ts", "allowed"])

    return gate


def politeness_gate(stream: DataFrame, delay_secs: float,
                    output_mode: str = "update") -> DataFrame:
    """Apply the stateful gate to a (host, url, ts) stream."""
    return stream.groupBy("host").applyInPandasWithState(
        make_gate(delay_secs),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode=output_mode,
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
