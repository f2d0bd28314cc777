"""No-Spark registry sanity: load_all() must always succeed, and the
driver-facing priority window must reference only registered queries.

This is the cheap guard the round-2 incident demanded: a name in
_PRIORITY_WINDOW that no module registers is skipped (non-fatally) by
load_all(), and THIS test is what turns the typo into a loud CI failure
instead of a bricked round.
"""

from biglake_iceberg_python_spark.plans.registry import (
    _PRIORITY_WINDOW,
    load_all,
)


def test_load_all_succeeds_and_window_is_registered():
    registry = load_all()
    assert len(registry) >= 130
    missing = [n for n in _PRIORITY_WINDOW if n not in registry]
    assert not missing, f"priority window names not registered: {missing}"


def test_window_occupies_registration_prefix():
    registry = load_all()
    prefix = list(registry)[: len(_PRIORITY_WINDOW)]
    assert prefix == list(_PRIORITY_WINDOW)


def test_every_spec_is_well_formed():
    for name, spec in load_all().items():
        assert callable(spec.fn), name
        assert spec.oracle is None or isinstance(spec.oracle, str), name
