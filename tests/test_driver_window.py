"""Driver-contract window pins.

The driver records only the FIRST 50 ``queries()`` entries per round,
so ``_ordered_keys`` must put the never-driver-signed block right
after the declared q-set. This test pins the CURRENT round's window —
it is SUPPOSED to fail when a new round starts without rotating the
bands (the exact mechanical miss the r6 verdict flagged): update
``_ordered_keys`` AND this pin together each round.
"""

from __future__ import annotations

import re


def _window():
    import __spark_entry__ as m
    from kafana_spark.operators.registry import EXTENSION_QUERIES
    from kafana_spark.plans.declared import DECLARED_QUERIES

    keys = (list(DECLARED_QUERIES)
            + m._ordered_keys(list(EXTENSION_QUERIES)))
    return keys[:50]


def test_round7_window_is_q_set_plus_x113_x140():
    w = _window()
    assert len(w) == 50
    assert all(k.startswith("q") for k in w[:22])
    ns = [int(re.match(r"x(\d+)", k).group(1)) for k in w[22:]]
    assert ns == list(range(113, 141)), ns


def test_oracle_keys_match_query_keys():
    import __spark_entry__ as m

    q = set(m.queries())
    o = set(m.oracle_sql())
    assert o <= q
    # exactly the documented rows-only key lacks an oracle
    assert q - o == {"x29_pack_sequences"}, sorted(q - o)
