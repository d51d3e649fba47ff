"""Dependency-free xlsx reader/writer (sources.xlsx_lite) and the
Excel template-ingest path built on it."""

from __future__ import annotations

import zipfile

from data_frame_demo_etl_spark.sources import xlsx_lite
from data_frame_demo_etl_spark.sources.readers import (
    _read_one_excel,
    expand_merged_headers,
)
from data_frame_demo_etl_spark.template_config import TemplateConfig


def test_roundtrip_types_and_padding(tmp_path):
    path = str(tmp_path / "t.xlsx")
    rows = [
        ["name", "qty", "price", "ok"],
        ["ale", 3, 2.5, True],
        ["bock", None, 0.1, False],  # None cell → gap in the grid
    ]
    xlsx_lite.write_xlsx(path, rows)
    grid, merges = xlsx_lite.read_grid(path)
    assert grid[0] == ["name", "qty", "price", "ok"]
    assert grid[1] == ["ale", 3, 2.5, True]
    assert grid[2] == ["bock", None, 0.1, False]
    assert merges == []
    # int vs float typing survives the round-trip exactly.
    assert isinstance(grid[1][1], int) and isinstance(grid[1][2], float)


def test_multisheet_and_selection(tmp_path):
    path = str(tmp_path / "m.xlsx")
    xlsx_lite.write_xlsx(
        path, {"alpha": [["a"]], "beta": [["b"]], "gamma": [["c"]]}
    )
    assert xlsx_lite.sheet_names(path) == ["alpha", "beta", "gamma"]
    assert xlsx_lite.read_grid(path, "beta")[0] == [["b"]]
    assert xlsx_lite.read_grid(path, 2)[0] == [["c"]]
    assert xlsx_lite.read_grid(path, None)[0] == [["a"]]
    # Unknown selectors fall back to the first sheet (reference
    # worksheet-selection fallback semantics).
    assert xlsx_lite.read_grid(path, "nope")[0] == [["a"]]
    assert xlsx_lite.read_grid(path, 99)[0] == [["a"]]


def test_merged_ranges_surface_for_header_expansion(tmp_path):
    path = str(tmp_path / "h.xlsx")
    xlsx_lite.write_xlsx(
        path,
        [["Region Totals", None, None], ["x", "y", "z"]],
        merges=["A1:C1"],
    )
    grid, merges = xlsx_lite.read_grid(path)
    assert merges == [(1, 1, 1, 3, "Region Totals")]
    headers, merged = expand_merged_headers(["Region Totals", "", ""], merges, 1)
    assert merged and headers == ["Region Totals"] * 3


def test_xml_escaping_roundtrip(tmp_path):
    path = str(tmp_path / "esc.xlsx")
    tricky = 'a<b & "c" > d'
    xlsx_lite.write_xlsx(path, [[tricky, "  spaced  "]])
    grid, _ = xlsx_lite.read_grid(path)
    assert grid[0] == [tricky, "  spaced  "]


def test_shared_strings_read(tmp_path):
    """Real writers pool strings in sharedStrings.xml — read that
    layout too (our writer uses inline strings)."""
    path = str(tmp_path / "ss.xlsx")
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
            '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            "</Types>",
        )
        zf.writestr(
            "_rels/.rels",
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>',
        )
        zf.writestr(
            "xl/workbook.xml",
            f'<?xml version="1.0"?><workbook xmlns="{ns}" '
            'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
            '<sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>',
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>',
        )
        zf.writestr(
            "xl/sharedStrings.xml",
            f'<?xml version="1.0"?><sst xmlns="{ns}"><si><t>hello</t></si>'
            "<si><r><t>ri</t></r><r><t>ch</t></r></si></sst>",
        )
        zf.writestr(
            "xl/worksheets/sheet1.xml",
            f'<?xml version="1.0"?><worksheet xmlns="{ns}"><sheetData>'
            '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c>'
            '<c r="C1"><v>7</v></c></row></sheetData></worksheet>',
        )
    grid, _ = xlsx_lite.read_grid(path)
    assert grid[0] == ["hello", "rich", 7]


def test_read_one_excel_template_semantics(tmp_path):
    """skiprows (physical) + header_row (post-skip) + merged title +
    combine_sheets through the openpyxl-free reader."""
    path = str(tmp_path / "tpl.xlsx")
    sheet = [
        ["Quarterly", None, None],
        ["junk", "junk", "junk"],
        ["id", "name", "value"],
        [1, "a", 1.5],
        [2, "b", 2.5],
    ]
    xlsx_lite.write_xlsx(
        path, {"q1": sheet, "q2": [r[:] for r in sheet]}, {"q1": ["A1:C1"], "q2": ["A1:C1"]}
    )
    tpl = TemplateConfig(
        source_type="excel", sheets=["q1", "q2"], combine_sheets=True,
        header_row=1, skiprows=[0],
    )
    pdf = _read_one_excel(path, tpl)
    assert list(pdf.columns) == ["id", "name", "value", "source_sheet"]
    assert len(pdf) == 4
    assert sorted(pdf["source_sheet"].unique()) == ["q1", "q2"]
    assert pdf["id"].tolist() == [1, 2, 1, 2]
    assert pdf["value"].dtype.kind == "f"


def test_exporter_xlsx_fallback_roundtrip(spark, tmp_path):
    from data_frame_demo_etl_spark.exporter import export_dataset

    df = spark.createDataFrame([(1, "x", 2.5), (2, "y", None)], "k long, s string, v double")
    written = export_dataset(df, tmp_path / "out", formats=("xlsx",))
    grid, _ = xlsx_lite.read_grid(str(written["xlsx"]), "data")
    assert grid[0] == ["k", "s", "v"]
    body = sorted(grid[1:], key=lambda r: r[0])
    assert body[0] == [1, "x", 2.5]
    assert body[1][:2] == [2, "y"] and body[1][2] is None
    meta_grid, _ = xlsx_lite.read_grid(str(written["xlsx"]), "meta")
    assert meta_grid[0] == ["key", "value"]
