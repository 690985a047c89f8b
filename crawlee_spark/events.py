"""EventManager facade: the reference's crawl-lifecycle event bus.

Reference surface being reproduced (``packages/core/src/events/
event_manager.ts:42-46``, ``local_event_manager.ts``): a subscribable bus
with the lifecycle events ``persistState`` (periodic state-persistence
tick, payload ``{"isMigrating": bool}``), ``migrating`` (platform is about
to move the crawler — persist and stop cleanly), ``aborting`` (platform is
killing the run), and ``exit``.

The SEMANTICS behind those events already exist in this engine — state is
persisted (snapshot-table commits + ``crawl_state.json``) at the end of
every superstep, every superstep is a resumable checkpoint, and a torn
superstep heals on resume. This module adds the missing subscribable
surface and wires it to those commit points (``engine.py::run``):

- after every superstep's state save: ``persistState``
  ``{"isMigrating": <an interrupt is pending>, "step": n}``;
- when an interrupt was requested via ``CrawlEngine.request_interrupt``:
  ``migrating`` / ``aborting`` once, then the run loop stops — the
  just-committed superstep is the checkpoint ``CrawlEngine.resume``
  continues from;
- at run end (normal or interrupted): ``exit``.

Listeners are synchronous (the reference awaits its async listeners at the
same boundaries — ``waitForAllListenersToComplete``); exceptions propagate
to the caller rather than being swallowed, matching a deliberate crash
surface: a failing persistState hook should fail the run, not corrupt it
silently (every superstep is already committed before listeners fire).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Any, Callable

EVENT_PERSIST_STATE = "persistState"
EVENT_MIGRATING = "migrating"
EVENT_ABORTING = "aborting"
EVENT_EXIT = "exit"

Listener = Callable[[dict[str, Any]], None]


class EventManager:
    """Thin synchronous pub/sub bus (event_manager.ts ``on/off/emit``)."""

    def __init__(self) -> None:
        self._listeners: dict[str, list[Listener]] = defaultdict(list)
        self.emitted: list[tuple[str, dict[str, Any]]] = []

    def on(self, event: str, listener: Listener) -> None:
        self._listeners[event].append(listener)

    def off(self, event: str, listener: Listener | None = None) -> None:
        """Remove one listener, or all listeners of the event when None
        (event_manager.ts:off)."""
        if listener is None:
            self._listeners[event] = []
        else:
            self._listeners[event] = [
                l for l in self._listeners[event] if l is not listener
            ]

    def listener_count(self, event: str) -> int:
        return len(self._listeners[event])

    def emit(self, event: str, payload: dict[str, Any] | None = None) -> None:
        data = payload or {}
        self.emitted.append((event, data))
        for listener in list(self._listeners[event]):
            listener(data)
