"""Schema-contract validation — parity with the reference's pandera
contract (reference src/schema.py, src/api/v1/engine.py:18-80):
levels off / coerce / contract, required-field checks, typed coercion
with per-field failure counts.

Failure counting is a single aggregation pass (one scan), never a
collect-and-inspect loop.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

_TYPE_ALIASES = {
    "date": "timestamp",
    "datetime": "timestamp",
    "int": "bigint",
    "integer": "bigint",
    "float": "double",
    "number": "double",
    "numeric": "double",
    "str": "string",
    "string": "string",
    "text": "string",
}


class SchemaContractError(ValueError):
    """Raised at level='contract' when the contract is violated."""

    def __init__(self, failures: list[dict]):
        self.failures = failures
        super().__init__(f"schema contract violated: {failures}")


@dataclass
class ValidationResult:
    is_valid: bool
    errors: list[dict] = field(default_factory=list)
    row_count: int = 0
    coerced: DataFrame | None = None


def coerce_field_types(df: DataFrame, type_map: Mapping[str, str]) -> tuple[DataFrame, DataFrame]:
    """Coerce columns to declared types; returns (coerced_df,
    failure_counts_df). Failure == non-null input that nulls out under
    try_cast (engine.py:18-52 parity).

    failure_counts_df has one row per coerced field:
    (field, failures, rows).
    """
    out = df
    checks = []
    n = F.count(F.lit(1))
    for col, spec in type_map.items():
        if col not in df.columns:
            continue
        target = _TYPE_ALIASES.get(str(spec).lower())
        if target is None or target == "string":
            if target == "string":
                out = out.withColumn(col, F.col(col).cast("string"))
            continue
        src = F.col(col).cast("string")
        converted = (
            F.try_to_timestamp(src) if target == "timestamp" else src.try_cast(target)
        )
        out = out.withColumn(col, converted)
        checks.append(
            F.sum(
                F.when(src.isNotNull() & converted.isNull(), 1).otherwise(0)
            ).alias(f"__fail_{col}")
        )
    if not checks:
        failures = df.sparkSession.createDataFrame([], "field string, failures bigint, rows bigint")
        return out, failures
    wide = df.agg(*checks, n.alias("__rows"))
    coerced_cols = [c for c in type_map if c in df.columns and _TYPE_ALIASES.get(str(type_map[c]).lower()) not in (None, "string")]
    stack_args = []
    for c in coerced_cols:
        stack_args.extend([F.lit(c), F.col(f"__fail_{c}")])
    failures = wide.select(
        F.stack(F.lit(len(coerced_cols)), *stack_args).alias("field", "failures"),
        F.col("__rows").alias("rows"),
    )
    return out, failures


def validate_contract(
    df: DataFrame,
    required_fields: Sequence[str] = (),
    field_types: Mapping[str, str] | None = None,
    level: str = "coerce",
) -> ValidationResult:
    """Validate against the contract (engine.validate parity).

    - 'off': pass-through.
    - 'coerce': coerce declared types, report failures, stay valid.
    - 'contract': missing required fields or any coercion failure →
      SchemaContractError.
    """
    level = (level or "coerce").lower()
    if level == "off":
        return ValidationResult(is_valid=True, row_count=df.count(), coerced=df)

    missing = [f for f in required_fields if f not in df.columns]
    if missing and level == "contract":
        raise SchemaContractError([{"column": c, "failure": "missing required column"} for c in missing])

    coerced, failures_df = coerce_field_types(df, field_types or {})
    failures = [r.asDict() for r in failures_df.collect() if r["failures"]]
    if failures and level == "contract":
        raise SchemaContractError(failures)

    errors = [{"column": c, "failure": "missing required column"} for c in missing]
    errors += [{"column": r["field"], "failure": f"{r['failures']} coercion failures"} for r in failures]
    return ValidationResult(
        is_valid=not missing, errors=errors, row_count=coerced.count(), coerced=coerced
    )


def k_anonymity(
    df: DataFrame,
    quasi_identifiers: Sequence[str],
    k: int = 5,
) -> DataFrame:
    """k-anonymity audit (Sweeney 2002): every combination of
    quasi-identifier values must be shared by ≥ k rows, or those rows
    are re-identifiable and must be suppressed/generalized before the
    dataset ships — the standard privacy gate a training-data release
    runs over demographic-ish columns.

    One aggregation: (QI..., n, meets_k). The equivalence-class table
    is bounded by the QI domain product, not the row count, so the
    audit output stays broadcastable no matter how large the input —
    and the single groupBy partial-aggregates map-side at any scale.
    Null QI values form their own equivalence class (they are still a
    linkable signature).
    """
    from pyspark.sql import functions as F

    qi = [F.col(c) for c in quasi_identifiers]
    return (
        df.groupBy(*qi)
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("meets_k", F.col("n") >= k)
    )


def customer_k_anonymity(spark, sf_dir: str) -> DataFrame:
    """Gate: k=5 anonymity audit of customers over the
    (market segment, nation) quasi-identifier pair, with each
    equivalence class's size and pass flag."""
    from pyspark.sql import functions as F

    from ..sources.catalog import load_table

    cust = load_table(spark, "customer", sf_dir)
    return k_anonymity(cust, ["c_mktsegment", "c_nationkey"], k=5).orderBy(
        "c_mktsegment", "c_nationkey"
    )


CUSTOMER_K_ANONYMITY_SQL = """
SELECT c_mktsegment, c_nationkey, COUNT(*) AS n, COUNT(*) >= 5 AS meets_k
FROM customer
GROUP BY c_mktsegment, c_nationkey
ORDER BY c_mktsegment, c_nationkey
"""
