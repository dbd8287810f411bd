"""Plan-only mode — the shared flag behind the service's
``format=explain`` contract ("analyze + optimize, execute NOTHING").

Operators that normally run driver-scalar probes or eager
materialization at DataFrame-CONSTRUCTION time (the prefix-filter
family's localCheckpoint, the default-edge-domain frequency probe)
consult this contextvar and stay lazy/representative instead. Set via
:func:`plan_only` by ``plans/query.run(plan_only=True)``."""

from __future__ import annotations

import contextvars
from contextlib import contextmanager

PLAN_ONLY = contextvars.ContextVar("plan_only", default=False)


@contextmanager
def plan_only():
    token = PLAN_ONLY.set(True)
    try:
        yield
    finally:
        PLAN_ONLY.reset(token)


def is_plan_only() -> bool:
    return PLAN_ONLY.get()
