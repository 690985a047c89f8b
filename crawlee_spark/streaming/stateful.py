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
    """Build the applyInPandasWithState function for a given host delay."""

    def gate(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (host,) = key
        if state.exists:
            next_allowed, emitted = state.get
        else:
            next_allowed, emitted = 0, 0
        rows: list[dict[str, Any]] = []
        for pdf in pdfs:
            for _, r in pdf.sort_values(["ts", "url"]).iterrows():
                ts = int(r["ts"])
                if ts >= next_allowed:
                    rows.append({"host": host, "url": r["url"], "ts": ts, "allowed": True})
                    next_allowed = ts + int(delay_secs)
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
