"""Plan-shape contract for the TPC-H completion set (Q9/Q11/Q13/Q15/
Q16/Q17/Q18/Q20/Q21). Value correctness is covered by the oracle
parity gate (test_oracle_parity runs every registered query against
DuckDB at sf0.01); these tests pin the PHYSICAL shapes that matter at
100 TB — no accidental cartesians, pushed filters on the fact scan,
broadcast constant dims.
"""

from __future__ import annotations

import pytest

from data_frame_demo_etl_spark import registry
from data_frame_demo_etl_spark.operators.audit import plan_report

NEW_TPCH = [
    "q9_product_type_profit",
    "q11_important_stock",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_parts_supplier_relationship",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q20_promo_part_suppliers",
    "q21_waiting_suppliers",
]

# 1-row scalar-aggregate crossJoins (the Q22 precedent): bounded by
# construction, everything else must be hash-join only.
SCALAR_SUBQUERY_CROSS = {"q11_important_stock", "q15_top_supplier"}

PUSHED = {
    "q9_product_type_profit": ["p_name"],
    "q15_top_supplier": ["l_shipdate"],
    "q16_parts_supplier_relationship": ["p_brand"],
    "q17_small_quantity_revenue": ["p_brand"],
    "q20_promo_part_suppliers": ["l_shipdate", "p_type"],
    "q21_waiting_suppliers": ["l_returnflag"],
    "q13_customer_distribution": ["o_orderpriority"],
}


@pytest.mark.parametrize("name", NEW_TPCH)
def test_shape(spark, sf_dir, name):
    df = registry.queries()[name](spark, sf_dir)
    rep = plan_report(df)
    if name not in SCALAR_SUBQUERY_CROSS:
        assert rep.nested_loop_joins == 0, (
            f"{name}: cartesian/nested-loop join\n{rep.raw[:3000]}"
        )
    else:
        # The only nested-loop allowed is the broadcast of the 1-row
        # aggregate — never more than one.
        assert rep.nested_loop_joins <= 1
    for col in PUSHED.get(name, ()):
        assert any(col in f for f in rep.pushed_filters), (
            f"{name}: filter on {col!r} not pushed; PushedFilters={rep.pushed_filters}"
        )


def test_q18_limit_is_deterministic(spark, sf_dir):
    """Two runs of the top-100 must agree row-for-row (unique
    o_orderkey tie-break under the o_totalprice sort)."""
    q = registry.queries()["q18_large_volume_customers"]
    a = [tuple(r) for r in q(spark, sf_dir).collect()]
    b = [tuple(r) for r in q(spark, sf_dir).collect()]
    assert a == b
    assert len(a) == len({r[2] for r in a})  # orderkeys unique


def test_q15_returns_all_ties(spark, sf_dir):
    """Max-revenue selection keeps every tied supplier (set semantics,
    not LIMIT 1)."""
    df = registry.queries()["q15_top_supplier"](spark, sf_dir)
    rows = df.collect()
    assert len(rows) >= 1
    assert len({r.total_revenue for r in rows}) == 1
