"""Registry-wide plan audit as a ROUND-CLOSE GATE (r11 verdict #6).

tools/plan_audit.py was a tool someone had to remember to run; this
slow-marked test makes a cartesian / scale-class-nested-loop
regression fail mechanically. Run it in the gate sequence:

    python -m pytest tests/test_plan_audit_gate.py -q

Plan-only (nothing executes except the handful of serve keys that
materialize bounded intermediates at call time), so the whole
registry audits in a few minutes at sf0.001.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


@pytest.mark.slow
def test_registry_plans_have_no_cartesians(spark):
    import __spark_entry__ as entry
    from tools.plan_audit import audit, plan_of

    bad: dict[str, dict] = {}
    errors: dict[str, str] = {}
    n = 0
    for key, fn in entry.queries().items():
        try:
            a = audit(plan_of(fn(spark, SF_SMOKE)))
        except Exception as e:  # noqa: BLE001 — report all, then fail
            errors[key] = f"{type(e).__name__}: {e}"[:200]
            continue
        n += 1
        if a["cart"]:
            bad[key] = a

    assert not errors, f"plan build failed for {sorted(errors)}: {errors}"
    assert n > 300, f"registry shrank? only {n} keys audited"
    # Gate = CartesianProduct only. BroadcastNestedLoopJoin is NOT
    # gated: the registry's crossJoin(broadcast(1-row totals)) idiom
    # compiles to BNLJ and is benign. Static scan multiplication is
    # TRIAGE, not a verdict — same-object subplans are healed by
    # runtime ReusedExchange (r11: eagerly materializing the worst
    # key regressed 7.57→11.2 s); confirm re-execution at runtime
    # before surgery.
    assert not bad, (
        f"CartesianProduct in physical plan of {sorted(bad)} — a "
        f"cartesian never survives a 100× scale-up; fix the join "
        f"condition or broadcast a bounded side: {bad}")
