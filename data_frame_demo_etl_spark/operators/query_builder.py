"""Programmatic query builder — parity with the reference's Query
Builder page (reference webapp/pages/04_Query_Builder.py:29-75):
column selection + a conjunctive filter list with operators
``= != > >= < <= contains``, rendered either as a Catalyst DataFrame
plan or as ANSI SQL text.

Because filters compile to plain Column expressions they push down to
the parquet scan (visible as PushedFilters in explain()).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

OPERATORS = ("=", "!=", ">", ">=", "<", "<=", "contains")


@dataclass(frozen=True)
class Filter:
    column: str
    operator: str
    value: object

    def to_column(self) -> Column:
        c = F.col(self.column)
        op = self.operator
        if op == "=":
            return c == self.value
        if op == "!=":
            return c != self.value
        if op == ">":
            return c > self.value
        if op == ">=":
            return c >= self.value
        if op == "<":
            return c < self.value
        if op == "<=":
            return c <= self.value
        if op.lower() == "contains":
            return c.cast("string").contains(str(self.value))
        raise ValueError(f"unsupported operator {op!r}")

    def to_sql(self) -> str:
        val = self.value
        lit = f"'{val}'" if isinstance(val, str) else repr(val)
        if self.operator.lower() == "contains":
            return f"{self.column} LIKE '%{val}%'"
        return f"{self.column} {self.operator} {lit}"


@dataclass(frozen=True)
class QuerySpec:
    columns: tuple[str, ...] = ()
    filters: tuple[Filter, ...] = ()
    order_by: tuple[str, ...] = ()
    limit: int | None = None

    def apply(self, df: DataFrame) -> DataFrame:
        out = df
        for f in self.filters:
            if not f.column or f.value is None:
                continue
            out = out.filter(f.to_column())
        if self.columns:
            out = out.select(*self.columns)
        if self.order_by:
            out = out.orderBy(*self.order_by)
        if self.limit is not None:
            out = out.limit(self.limit)
        return out

    def to_sql(self, table: str = "data") -> str:
        """SQL text generation (04_Query_Builder.py:29-43 parity,
        plus order/limit)."""
        select = ", ".join(self.columns) if self.columns else "*"
        where_parts = [f.to_sql() for f in self.filters if f.column and f.value is not None]
        where = f" WHERE {' AND '.join(where_parts)}" if where_parts else ""
        order = f" ORDER BY {', '.join(self.order_by)}" if self.order_by else ""
        lim = f" LIMIT {self.limit}" if self.limit is not None else ""
        return f"SELECT {select} FROM {table}{where}{order}{lim}"
