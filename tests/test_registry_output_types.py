"""Registry-wide result-surface contract: NO complex-typed columns.

The driver canonicalizes each query result through pandas (sort by
every column, then value-hash); pandas cannot factorize/sort
list-typed cells, so an ``array<...>`` / ``map<...>`` / ``struct<...>``
output column errors the driver row even when the values are correct —
exactly how x130_term_vectors went red in CORRECTNESS_r07 (its
``positions: array<int>`` hit ``TypeError: unhashable type: 'list'``
in the driver's sort). The local check_oracle ``str()``s values and
masked it for two rounds. This test locks the class shut: every
``queries()`` output schema must be scalar-typed, checked at sf0.001
(schema only — plans are built, not executed, except where an
operator materializes internally by design).
"""

from __future__ import annotations

from pyspark.sql.types import ArrayType, MapType, StructType

from tests.conftest import SF_SMOKE


def _complex_fields(schema):
    return [f.name for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))]


def test_no_query_output_has_complex_typed_columns(spark):
    import __spark_entry__ as m

    bad = {}
    errs = {}
    for name, fn in m.queries().items():
        try:
            df = fn(spark, SF_SMOKE)
        except Exception as e:  # building the plan must not fail either
            errs[name] = f"{type(e).__name__}: {e}"
            continue
        cplx = _complex_fields(df.schema)
        if cplx:
            bad[name] = cplx
    assert not errs, errs
    assert not bad, (
        f"complex-typed output columns break the driver canonicalizer: "
        f"{bad} — flatten (array_join / one-row-per-element) and update "
        f"the DuckDB oracle in lockstep")
