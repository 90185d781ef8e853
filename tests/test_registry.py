"""Registry integrity gates.

The r5 verdict found a silent duplicate registration (``REGISTRY`` is a
plain dict, so the second ``register()`` overwrote the first and left a
dead definition behind). These tests pin the fix: duplicate names raise
at import time, the driver-priority window references only real
oracle-checked queries, and the window is exactly the 50-slot budget.
"""

from __future__ import annotations

import pytest

from mongodb_cdc_delta_spark.queries import (
    _DRIVER_PRIORITY,
    REGISTRY,
    all_queries,
    register,
)


class TestDuplicateGuard:
    def test_duplicate_registration_raises(self):
        reg = all_queries()
        existing = next(iter(reg))
        with pytest.raises(ValueError, match="duplicate query registration"):

            @register(existing, oracle=None)
            def _dup(spark, sf):  # pragma: no cover - never runs
                raise AssertionError

        # the guard must not have clobbered the original entry
        assert REGISTRY[existing] is reg[existing]

    def test_no_silent_shadowing_happened(self):
        # all_queries() imports every query module; if any module ever
        # re-registers a name, the import itself raises and this fails.
        reg = all_queries()
        assert len(reg) == len(set(reg))


class TestDriverWindow:
    def test_window_is_exactly_the_budget(self):
        assert len(_DRIVER_PRIORITY) == 50
        assert len(set(_DRIVER_PRIORITY)) == 50

    def test_window_names_exist_and_are_oracle_checked(self):
        reg = all_queries()
        missing = [n for n in _DRIVER_PRIORITY if n not in reg]
        assert not missing, f"driver window references unknown queries: {missing}"
        rows_only = [n for n in _DRIVER_PRIORITY if reg[n].oracle is None]
        assert not rows_only, (
            f"driver window slots must be hash-checkable: {rows_only}"
        )

    def test_window_is_the_registration_prefix(self):
        ordered = list(all_queries())
        assert ordered[: len(_DRIVER_PRIORITY)] == list(_DRIVER_PRIORITY)
