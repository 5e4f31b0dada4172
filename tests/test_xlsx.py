"""Native xlsx reader (S9/F23): a real .xlsx fixture is built with
stdlib zipfile (standard OOXML parts) and read end-to-end into a
DataFrame — no openpyxl anywhere."""

from __future__ import annotations

import zipfile

import pytest

from databridge_etl_tools_spark.sources.xlsx import (
    read_xlsx_rows,
    xlsx_to_df,
)

_CT = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
<Override PartName="/xl/worksheets/sheet2.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
 xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets>
<sheet name="Staff" sheetId="1" r:id="rId1"/>
<sheet name="Empty" sheetId="2" r:id="rId2"/>
</sheets>
</workbook>"""

_WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>
<Relationship Id="rId3" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>
</Relationships>"""

# 4 shared strings incl. a rich-text run (two <r> pieces concatenate)
_SHARED = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="4" uniqueCount="4">
<si><t>Name</t></si>
<si><t>Score</t></si>
<si><t>Active</t></si>
<si><r><t>Al</t></r><r><t>ice</t></r></si>
</sst>"""

# header row, mixed-type data rows, an ALL-EMPTY row (r=4, styled but
# valueless cells — the reference drops it), and a sparse row
_SHEET1 = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<sheetData>
<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c></row>
<row r="2"><c r="A2" t="s"><v>3</v></c><c r="B2"><v>91.5</v></c><c r="C2" t="b"><v>1</v></c></row>
<row r="3"><c r="A3" t="inlineStr"><is><t>Bob</t></is></c><c r="B3"><v>88</v></c><c r="C3" t="b"><v>0</v></c></row>
<row r="4"><c r="A4"/><c r="B4"/><c r="C4"/></row>
<row r="5"><c r="A5" t="str"><v>Cara</v></c><c r="C5" t="b"><v>1</v></c></row>
</sheetData>
</worksheet>"""

_SHEET2 = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<sheetData>
<row r="1"><c r="A1" t="inlineStr"><is><t>only_header</t></is></c></row>
</sheetData>
</worksheet>"""


@pytest.fixture()
def xlsx_file(tmp_path):
    path = tmp_path / "staff.xlsx"
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CT)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        z.writestr("xl/sharedStrings.xml", _SHARED)
        z.writestr("xl/worksheets/sheet1.xml", _SHEET1)
        z.writestr("xl/worksheets/sheet2.xml", _SHEET2)
    return str(path)


def test_raw_rows_decode_all_cell_types(xlsx_file):
    rows = read_xlsx_rows(xlsx_file)
    assert rows[0] == ["Name", "Score", "Active"]
    assert rows[1] == ["Alice", 91.5, True]  # shared rich-text run concatenated
    assert rows[2] == ["Bob", 88, False]  # inline string + integral number
    assert rows[3] == [None, None, None]  # styled-but-empty cells
    assert rows[4] == ["Cara", None, True]  # sparse row: B5 missing entirely


def test_xlsx_to_df_drops_all_null_rows_and_types(spark, xlsx_file):
    df = xlsx_to_df(spark, xlsx_file)
    assert df.columns == ["name", "score", "active"]
    kinds = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert kinds == {"name": "string", "score": "double", "active": "boolean"}
    rows = {tuple(r) for r in df.collect()}
    assert rows == {
        ("Alice", 91.5, True),
        ("Bob", 88.0, False),
        ("Cara", None, True),
    }


def test_sheet_selection_by_name(spark, xlsx_file):
    rows = read_xlsx_rows(xlsx_file, sheet="Empty")
    assert rows == [["only_header"]]
    df = xlsx_to_df(spark, xlsx_file, sheet="Empty")
    assert df.columns == ["only_header"] and df.count() == 0
