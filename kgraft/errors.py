"""Typed engine error model (reference C3 parity).

The reference declares an exception hierarchy — ``BaseError`` with a
timestamped message plus ``ConfigError`` / ``ModuleError`` /
``NetIOError`` / ``TimeoutError`` (`exception.py:21-71`) — but its
default-message lookup is broken (`exception.py:28` indexes the class
with ``type(self)``; SURVEY.md §1.2). The engine keeps the intent and
fixes the mechanics: every class formats eagerly, carries a stable
``kind`` for metrics/dead-letter tagging, and the data-plane subclasses
also inherit the builtin type callers naturally catch (``ValueError``)
so the hierarchy is additive, never breaking.

Transient worker-side failures are NOT represented here — Ray task
retry handles those (SURVEY.md §4 retries row); these types are for
driver-side plan/config mistakes and the auditable dead-letter path.
"""

from __future__ import annotations

import time


class KgraftError(Exception):
    """Base: timestamped message (the reference's ``BaseError`` intent,
    `exception.py:21-45`) + a stable ``kind`` tag."""

    kind = "error"

    def __init__(self, msg: str):
        self.msg = msg
        self.ts = time.time()
        super().__init__(msg)

    def __str__(self) -> str:  # timestamp rendered lazily, stored eagerly
        stamp = time.strftime("%Y-%m-%d %H:%M:%S", time.gmtime(self.ts))
        return f"[{stamp}] {self.kind}: {self.msg}"


class ConfigError(KgraftError, ValueError):
    """Invalid pipeline/operator configuration (reference
    ``ConfigError``, `exception.py:48-55`)."""

    kind = "config"


class SchemaError(KgraftError, ValueError):
    """Column/type contract violation between operator inputs (e.g.
    ambiguous non-key columns on both join sides)."""

    kind = "schema"


class PlanError(KgraftError, ValueError):
    """Unknown/unsupported operator option (join type, window kind,
    aggregate kind, set op)."""

    kind = "plan"
