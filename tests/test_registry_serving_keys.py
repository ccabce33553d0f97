"""SERVING_KEYS drift tripwire (ADVICE r8): bench.py's serving-path
subtotal is driven by the registry's EXPLICIT list, not a name match.
A new stored-index twin must be declared consciously — a key that
merely contains 'stored' without a SERVING_KEYS entry fails here
instead of silently skewing the gating metric."""

from kafana_spark.operators.registry import (EXTENSION_QUERIES,
                                             SERVING_KEYS)


def test_serving_keys_exist_in_registry():
    missing = set(SERVING_KEYS) - set(EXTENSION_QUERIES)
    assert not missing, sorted(missing)


def test_stored_named_keys_are_declared_serving():
    undeclared = {k for k in EXTENSION_QUERIES
                  if "stored" in k and k not in SERVING_KEYS}
    assert not undeclared, (
        f"{sorted(undeclared)} look like stored-index serving twins "
        "but are not in SERVING_KEYS — declare (or rename) them")


def test_no_duplicate_serving_keys():
    assert len(SERVING_KEYS) == len(set(SERVING_KEYS))
