"""Headless API layer: typed request/response parity with reference
endpoints.py, handlers wired through the engine."""

from __future__ import annotations

from data_frame_demo_etl_spark.api import (
    ErrorResponse,
    IngestRequest,
    ProcessResult,
    TransformRequest,
    ingest_endpoint,
    transform_endpoint,
    validate_endpoint,
)

ROWS = [
    {"sku": "A1", "qty": "5", "amount": "10,50"},
    {"sku": "A2", "qty": "7", "amount": "20,00"},
]
TEMPLATE = {
    "name": "t",
    "columns": ["sku", "qty", "amount"],
    "field_types": {"qty": "int"},
}


def test_ingest_endpoint_roundtrip(spark):
    out = ingest_endpoint(spark, {"template": TEMPLATE, "rows": ROWS})
    assert isinstance(out, ProcessResult)
    assert out.success and out.row_count == 2
    assert out.metrics["columns"] == ["sku", "qty", "amount"]


def test_transform_endpoint_validates(spark):
    out = transform_endpoint(
        spark, TransformRequest(template=TEMPLATE, rows=ROWS, validation_level="coerce")
    )
    assert isinstance(out, ProcessResult)
    assert out.success
    assert out.row_count == 2
    assert "validation" in out.metrics


def test_validate_endpoint_reports_rows(spark):
    out = validate_endpoint(spark, {"template": TEMPLATE, "rows": ROWS})
    assert out.is_valid
    assert out.row_count == 2


def test_endpoints_return_typed_errors(spark):
    # empty rows
    out = ingest_endpoint(spark, {"template": TEMPLATE, "rows": []})
    assert isinstance(out, ErrorResponse) and out.error == "ingest_failed"
    assert "no rows" in (out.details or "")
    # non-mapping payload
    out = transform_endpoint(spark, ["not", "a", "dict"])  # type: ignore[arg-type]
    assert isinstance(out, ErrorResponse) and out.error == "transform_failed"
    # request models build from partial payloads with defaults
    req = IngestRequest.from_dict({})
    assert req.rows == [] and req.template == {}
    # typo'd validation level must error, not silently coerce
    out = validate_endpoint(
        spark, {"template": TEMPLATE, "rows": ROWS, "validation_level": "contrct"}
    )
    assert isinstance(out, ErrorResponse)
    assert "unknown validation_level" in (out.details or "")
