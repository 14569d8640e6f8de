"""Invariants of the packed driver contract (__spark_entry__):
every packed entry keeps an oracle, the count stays under the
driver's per-round verification budget, and no raw implementation is
silently dropped by the packing."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry  # noqa: E402


def test_packed_contract_shape():
    q, o, raw = entry.queries(), entry.oracle_sql(), entry.raw_queries()
    assert set(q) == set(o)
    assert len(q) <= 50, f"driver verifies ~50 entries/round, got {len(q)}"
    # all raw implementations are reachable: every raw name is either
    # packed under its own name, a dual base, or a suite part
    packed_parts = set(q)
    for base in entry._DUAL:
        packed_parts |= {base, base + "_indexed"}
    for parts in entry._SUITES.values():
        packed_parts |= {n for _, n in parts}
    packed_parts |= {
        "token_counts",
        "token_counts_bpe",
    }
    missing = set(raw) - packed_parts
    assert not missing, f"raw implementations not packed: {sorted(missing)}"


def test_dual_and_suite_oracles_are_tagged():
    o = entry.oracle_sql()
    for base in entry._DUAL:
        assert "'corpus' AS path" in o[base] and "'indexed' AS path" in o[base]
    for new, parts in entry._SUITES.items():
        for v, _ in parts:
            assert f"'{v}' AS variant" in o[new]
