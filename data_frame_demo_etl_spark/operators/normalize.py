"""Schema-mapping helpers: canonical-field auto-mapping, header
guessing, and ranked schema candidates.

These decide *column-level* metadata, so they run driver-side over
column names and (for data-dependent heuristics) over the distributed
single-pass stats from ``profile.column_stats_df`` — never over
collected data.

Parity: reference src/core.py:246-282 (snake_case/auto_map_columns),
src/services/header_detection.py:16-26 (guess_header_row),
src/services/schema_candidates.py (candidate ranking).
"""

from __future__ import annotations

import difflib
from collections.abc import Mapping, Sequence

import pandas as pd

from pyspark.sql import DataFrame

from .profile import column_stats_df, is_numeric_col, is_texty_col

# Default canonical schema synonyms (public demo domain).
TARGET_SCHEMA: dict[str, list[str]] = {
    "provider_id": ["provider", "vendor", "supplier", "source", "partner"],
    "article_sku": ["sku", "item", "material", "product"],
    "report_date": ["date", "period", "month", "time", "year"],
    "sales_qty": ["qty", "quantity", "units", "volume"],
    "sales_amount": ["amount", "total", "revenue", "sales", "net", "gross"],
    "order_id": ["order", "po number", "reference"],
    "region": ["region", "area", "location"],
    "unit_price": ["unit_price", "price", "unit cost", "rate"],
}


def snake_case(text: str) -> str:
    cleaned = "".join(ch if ch.isalnum() else "_" for ch in text)
    while "__" in cleaned:
        cleaned = cleaned.replace("__", "_")
    return cleaned.strip("_").lower()


def auto_map_columns(
    headers: Sequence[str], target_schema: Mapping[str, Sequence[str]] | None = None
) -> dict[str, str]:
    """Best-effort header → canonical-field mapping: substring match on
    the synonym pool first, then fuzzy (difflib ratio ≥ 0.82); each
    target is claimed at most once; unmatched headers snake_case."""
    schema = target_schema or TARGET_SCHEMA
    mapping: dict[str, str] = {}
    used: set[str] = set()
    for header in headers:
        hl = header.lower().strip()
        best = None
        for target, synonyms in schema.items():
            if target in used:
                continue
            pool = [target, *synonyms]
            if any(p.lower() and p.lower() in hl for p in pool):
                best = target
                break
            if difflib.get_close_matches(hl, pool, n=1, cutoff=0.82):
                best = target
                break
        if best:
            mapping[header] = best
            used.add(best)
        else:
            mapping[header] = snake_case(header)
    return mapping


def normalize_header_text(text: str) -> str:
    """Lowercase, strip punctuation, collapse whitespace (reference
    webapp/pages/02_Mapping.py:29-31)."""
    import re

    cleaned = re.sub(r"[^a-z0-9]+", " ", text.lower())
    return re.sub(r"\s+", " ", cleaned).strip()


def best_target(source: str, synonyms: Mapping[str, Sequence[str]], cutoff: float = 0.6) -> str | None:
    """Highest-similarity canonical field for one header, or None below
    cutoff (reference 02_Mapping.py:34-47 semantics)."""
    source_norm = normalize_header_text(source)
    best_score, best = 0.0, None
    for target, terms in synonyms.items():
        for term in [target, *terms]:
            score = difflib.SequenceMatcher(None, source_norm, normalize_header_text(term)).ratio()
            if score > best_score:
                best_score, best = score, target
    return best if best_score >= cutoff else None


def infer_simple_type(spark_dtype: str) -> str:
    """Coarse UI type label for a Spark dtype (reference
    02_Mapping.py:50-57 semantics)."""
    d = spark_dtype.lower()
    if d.startswith(("timestamp", "date")):
        return "Date"
    if d in ("boolean",):
        return "Boolean"
    if d.startswith(("int", "bigint", "smallint", "tinyint", "double", "float", "decimal", "long")):
        return "Number"
    return "Text"


def guess_header_row(preview: pd.DataFrame) -> int:
    """Heuristic over a small driver-side preview: the first row that
    is mostly strings and mostly populated is the header."""
    n_cols = preview.shape[1]
    for idx, (_, row) in enumerate(preview.iterrows()):
        non_null = row.dropna()
        if non_null.empty:
            continue
        str_ratio = sum(isinstance(v, str) for v in non_null) / len(non_null)
        width_ratio = len(non_null) / n_cols if n_cols else 0
        if str_ratio > 0.8 and width_ratio > 0.5:
            return idx
    return 0


def schema_diff(
    headers: Sequence[str], target_fields: Sequence[str] | None
) -> tuple[list[str], list[str]]:
    """(missing, extra) vs the expected field set."""
    expected = set(target_fields or [])
    got = set(headers)
    return sorted(expected - got), sorted(got - expected)


def build_schema_candidates(
    df: DataFrame, target_fields: Sequence[str] | None = None
) -> list[dict]:
    """Ranked header-layout candidates driven by distributed column
    stats (one aggregation pass over the data)."""
    stats = {r["column_name"]: r.asDict() for r in column_stats_df(df).collect()}
    headers = list(df.columns)
    numeric = [c for c in headers if is_numeric_col(stats[c])]
    texty = [c for c in headers if is_texty_col(stats[c])]

    candidates: list[dict] = [
        {"label": "As detected", "headers": headers, "score": 0.20, "note": "Headers as read."}
    ]

    # Contiguous numeric blocks with an optional text key on the left.
    block: list[str] = []
    blocks: list[list[str]] = []
    for c in headers:
        if c in numeric:
            block.append(c)
        elif block:
            blocks.append(block)
            block = []
    if block:
        blocks.append(block)
    for blk in blocks:
        start = headers.index(blk[0])
        ordered = list(blk)
        score = 0.5 + 0.05 * len(blk)
        note = f"Numeric block of {len(blk)} columns"
        if start > 0 and headers[start - 1] in texty:
            ordered = [headers[start - 1], *ordered]
            score += 0.1
            note += f"; key column '{headers[start-1]}' on the left"
        candidates.append(
            {"label": "Numeric block ordering", "headers": ordered, "score": min(score, 0.9), "note": note}
        )

    if texty and numeric:
        candidates.append(
            {
                "label": "Key + numeric measures",
                "headers": [texty[0], *numeric],
                "score": 0.55 + 0.05 * len(numeric),
                "note": f"Text key '{texty[0]}' with numeric measures.",
            }
        )

    for cand in candidates:
        missing, extra = schema_diff(cand["headers"], target_fields)
        cand["missing"], cand["extra"] = missing, extra
    return sorted(candidates, key=lambda c: -c["score"])


# --- learned-synonym persistence ------------------------------------------
# Reference parity: core.py:56-120 — user-learned header→field mappings
# are saved in a SIBLING override file (never rewriting the base
# config) and merged over the base synonyms on load, with
# case-insensitive list dedup. JSON here (the base TARGET_SCHEMA is
# code, and json is stdlib); the merge/override semantics are the
# compatibility surface, not the serialization.


def user_override_path(config_path):
    """Sibling path for user-learned overrides: `<stem>.user<suffix>`."""
    from pathlib import Path

    p = Path(config_path)
    return p.with_name(f"{p.stem}.user{p.suffix}")


def merge_synonym_maps(
    base: Mapping[str, Sequence[str]], new_items: Mapping[str, Sequence[str]]
) -> dict[str, list[str]]:
    """Append `new_items` onto `base` per target, deduplicating
    case-insensitively while preserving first-seen casing/order."""
    merged: dict[str, list[str]] = {str(k): [str(v) for v in vs] for k, vs in base.items()}
    for target, values in new_items.items():
        bucket = merged.setdefault(str(target), [])
        seen = {v.lower() for v in bucket}
        for value in values:
            s = str(value)
            if s.lower() not in seen:
                bucket.append(s)
                seen.add(s.lower())
    return merged


def load_synonyms(config_path=None) -> dict[str, list[str]]:
    """Base synonyms (TARGET_SCHEMA or a JSON config file) merged with
    the sibling user-override file, if present."""
    import json
    from pathlib import Path

    if config_path is None:
        return {k: list(v) for k, v in TARGET_SCHEMA.items()}
    p = Path(config_path)
    base: dict[str, list[str]] = {k: list(v) for k, v in TARGET_SCHEMA.items()}
    if p.exists():
        try:
            data = json.loads(p.read_text(encoding="utf-8"))
            if isinstance(data, dict):
                base = merge_synonym_maps(base, data.get("synonyms", data))
        except (json.JSONDecodeError, OSError):
            pass
    user = user_override_path(p)
    if user.exists():
        try:
            data = json.loads(user.read_text(encoding="utf-8"))
            if isinstance(data, dict):
                base = merge_synonym_maps(base, data.get("synonyms", data))
        except (json.JSONDecodeError, OSError):
            pass
    return base


def learn_synonyms(
    new_items: Mapping[str, Sequence[str]], config_path
) -> dict[str, list[str]]:
    """Persist user-learned mappings into the override file (merging
    with what it already holds — the base file is never touched) and
    return the full merged view."""
    import json

    user = user_override_path(config_path)
    existing: dict[str, list[str]] = {}
    if user.exists():
        try:
            data = json.loads(user.read_text(encoding="utf-8"))
            if isinstance(data, dict):
                existing = data.get("synonyms", data)
        except (json.JSONDecodeError, OSError):
            existing = {}
    updated = merge_synonym_maps(existing, new_items)
    user.write_text(json.dumps({"synonyms": updated}, indent=2), encoding="utf-8")
    return load_synonyms(config_path)
