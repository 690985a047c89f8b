"""Router: label -> handler dispatch (``packages/core/src/router.ts:32-55``).

The reference's ``Router.addHandler(label, fn)`` registers per-label request
handlers with an optional default; dispatch picks the handler whose label
matches ``request.label`` and throws on a missing route (``router.ts:52-55``
"Route not found"). Duplicate registration throws (``router.ts:36-44``).

Set-based mapping: one superstep's successful fetches form a DataFrame with
a ``label`` column; each registered handler is a DataFrame -> DataFrame
transform applied to its label SLICE (a filter over the shared persisted
fetch set — no shuffle, label count is config-sized), and the slices'
outputs are unioned by name. Handlers therefore express per-label parsing /
projection / pushData logic declaratively, and Catalyst plans each slice
independently (filters push into the shared scan).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Handler = Callable[[DataFrame], DataFrame]


class MissingRouteError(KeyError):
    """No handler for a label and no default registered
    (``router.ts:52-55``)."""


class Router:
    def __init__(self) -> None:
        self._handlers: dict[str, Handler] = {}
        self._default: Handler | None = None

    def add_handler(self, label: str, handler: Handler) -> None:
        if label in self._handlers:
            raise ValueError(f"handler for label {label!r} already registered")
        self._handlers[label] = handler

    def add_default_handler(self, handler: Handler) -> None:
        if self._default is not None:
            raise ValueError("default handler already registered")
        self._default = handler

    # decorator sugar mirroring router.use patterns
    def handler(self, label: str) -> Callable[[Handler], Handler]:
        def deco(fn: Handler) -> Handler:
            self.add_handler(label, fn)
            return fn

        return deco

    def __call__(self, pages: DataFrame, strict: bool = True) -> DataFrame | None:
        """Dispatch ``pages`` (must carry a ``label`` column) to handlers.

        Returns the unionByName (allowMissingColumns) of every handler's
        output, or None when no handler produced rows. ``strict`` mirrors
        the reference throw: rows whose label has no handler AND no default
        raise MissingRouteError (the check is one count on the already-
        materialized fetch set slice).
        """
        outs: list[DataFrame] = []
        labeled = F.col("label")
        for label, fn in self._handlers.items():
            outs.append(fn(pages.filter(labeled == label)))
        rest = pages.filter(
            labeled.isNull() | ~labeled.isin(list(self._handlers)) if self._handlers
            else F.lit(True)
        )
        if self._default is not None:
            outs.append(self._default(rest))
        elif strict and not rest.isEmpty():
            missing = [r["label"] for r in rest.select("label").distinct().collect()]
            raise MissingRouteError(
                f"no handler (and no default) for labels: {missing}"
            )
        if not outs:
            return None
        res = outs[0]
        for o in outs[1:]:
            res = res.unionByName(o, allowMissingColumns=True)
        return res
