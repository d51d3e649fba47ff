"""Physical-plan auditing: programmatic checks that a DataFrame's
executed plan has the shape you intended — filters pushed to scans,
dims broadcast, no accidental cartesian products or stray shuffles.

Meant for perf CI: assert on the report instead of eyeballing
``explain()`` output.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanReport:
    broadcast_joins: int = 0
    sort_merge_joins: int = 0
    nested_loop_joins: int = 0
    exchanges: int = 0
    scans: int = 0
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    wholestage_codegen: bool = False
    raw: str = ""


def plan_report(df: DataFrame) -> PlanReport:
    # FileScan metadata (PushedFilters, Location, ReadSchema) renders
    # truncated at spark.sql.maxMetadataStringLength (default 100
    # chars) — enough to hide a pushed In(...) list entirely. Raise it
    # for the duration of the render only (scoped save/restore, no
    # session-wide mutation).
    conf = df.sparkSession.conf
    key = "spark.sql.maxMetadataStringLength"
    saved = conf.get(key, None)
    conf.set(key, "4096")
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        if saved is None:
            conf.unset(key)
        else:
            conf.set(key, saved)
    rep = PlanReport(raw=plan)
    rep.broadcast_joins = plan.count("BroadcastHashJoin")
    rep.sort_merge_joins = plan.count("SortMergeJoin")
    rep.nested_loop_joins = plan.count("BroadcastNestedLoopJoin") + plan.count(
        "CartesianProduct"
    )
    rep.exchanges = len(re.findall(r"Exchange hashpartitioning", plan))
    rep.scans = plan.count("FileScan")
    # Per-line capture with three constraints: In(col, [a,b]) filters
    # contain ']' (a greedy-to-']' capture truncates them), Spark
    # truncates long scan lines (the closing bracket may be missing
    # entirely), and FileScan renders ', ReadSchema: struct<...>' on
    # the SAME line (a to-end-of-line capture would swallow every read
    # column and make pushdown assertions vacuously true). So: take
    # the text after 'PushedFilters: [', cut before any 'ReadSchema:'
    # tail, then strip the delimiter trailer.
    rep.pushed_filters = []
    for line in plan.splitlines():
        idx = line.find("PushedFilters: [")
        if idx == -1:
            continue
        frag = line[idx + len("PushedFilters: [") :]
        cut = frag.find("ReadSchema:")
        if cut != -1:
            frag = frag[:cut].rstrip().rstrip(",").rstrip()
        # The list's own closing ']' (an inner In(...) ends in ')',
        # which stops the strip before its bracket is touched).
        frag = frag.rstrip("]")
        if frag:
            rep.pushed_filters.append(frag)
    rep.read_schemas = re.findall(r"ReadSchema: (\S+)", plan)
    rep.wholestage_codegen = "WholeStageCodegen" in plan
    return rep


def self_join_fanouts(df: DataFrame) -> list[str]:
    """Self-join fan-out detector (the fourth structural audit): walk
    the OPTIMIZED logical plan and report every Join whose two
    children are structurally identical — same DFS sequence of node
    classes and same normalized leaf signatures. That is the shape
    where a single hot join key emits |key-group|² output rows from
    one task (the Σdeg² wedge blowup the r11 verdict caught in G9):
    the cartesian and window audits are blind to it because the join
    is a plain equi-join and the explosion happens in aggregation
    fan-out, not in the join TYPE.

    A flagged join is not automatically wrong — oriented wedge joins
    (G3) and capped KNN self-joins (G9) are legitimate BECAUSE an
    upstream bound caps the per-key group size; the registry audit
    forces each one to carry that justification in its allowlist
    entry, exactly like CARTESIAN_ALLOWED / GLOBAL_WINDOW_ALLOWED.

    Detection is on node SHAPE, not expression text: alias names
    differ between the two branches of a self-join (``x`` vs ``y``),
    so textual subtree equality would miss exactly the case that
    matters. Leaves are normalized to (class, column data types) —
    expression ids and names stripped."""

    def leaf_sig(node) -> str:
        try:
            dtypes = ",".join(
                node.output().apply(i).dataType().simpleString()
                for i in range(node.output().length())
            )
        except Exception:  # noqa: BLE001 — plan classes vary by node
            dtypes = "?"
        return f"{node.getClass().getSimpleName()}[{dtypes}]"

    def shape(node) -> str:
        ch = node.children()
        n = ch.length()
        if n == 0:
            return leaf_sig(node)
        kids = ";".join(shape(ch.apply(i)) for i in range(n))
        return f"{node.getClass().getSimpleName()}({kids})"

    hits: list[str] = []

    def is_scalar_agg(node) -> bool:
        # A grouping-free Aggregate emits AT MOST ONE row — a join
        # against it (the q22/guard scalar-broadcast shape) cannot
        # produce |group|² fan-out, whatever the other side is. Shape
        # matching alone would flag it whenever the optimizer's
        # simplifications make both children's class trees coincide
        # (e.g. the keyed-prefix offset-count guard over the same
        # cached layout).
        if node.getClass().getSimpleName() != "Aggregate":
            return False
        try:
            return node.groupingExpressions().isEmpty()
        except Exception:  # noqa: BLE001 — plan classes vary by node
            return False

    def walk(node) -> None:
        ch = node.children()
        n = ch.length()
        kids = [ch.apply(i) for i in range(n)]
        if (
            node.getClass().getSimpleName() == "Join"
            and n == 2
            and not any(is_scalar_agg(k) for k in kids)
        ):
            left, right = shape(kids[0]), shape(kids[1])
            if left == right:
                hits.append(left)
        for k in kids:
            walk(k)

    walk(df._jdf.queryExecution().optimizedPlan())
    return hits


def assert_no_cartesian(df: DataFrame) -> None:
    rep = plan_report(df)
    if rep.nested_loop_joins:
        raise AssertionError(f"plan contains nested-loop/cartesian join:\n{rep.raw}")


def assert_filters_pushed(df: DataFrame, expect_substring: str) -> None:
    rep = plan_report(df)
    if not any(expect_substring in f for f in rep.pushed_filters):
        raise AssertionError(
            f"no pushed filter mentioning {expect_substring!r}; got {rep.pushed_filters}"
        )
