"""Compile-environment epoch for the compiled-plan cache.

A compiled Datalog plan is pure per (catalog, query) ONLY while the
compile environment stands still: the user fn allowlist
(query_fn_allowlist_test.clj semantics), the custom-aggregate registry,
and the sampling seed are all baked into the Catalyst expressions at
compile time. Any mutation of those registries bumps this epoch; the
plan-cache key carries the epoch, so stale plans simply miss (no
cross-catalog bookkeeping needed).
"""

_EPOCH = 0


def bump() -> None:
    global _EPOCH
    _EPOCH += 1


def current() -> int:
    return _EPOCH
