"""Minimal from-scratch XLSX sink (reference S16: the styled score
tables land in a spreadsheet via ``styler.to_excel``,
``/root/reference/src/extraction_benchmark/eval.py:201-239``).

This sandbox has no openpyxl, and an engine should not depend on one for
a fixed, tiny artifact: an .xlsx file is a zip of a handful of OOXML
parts, all of which are generated here as deterministic strings —
inline-string cells (no sharedStrings part), one ``styles.xml`` with a
single bold font for the per-column-maximum highlighting, ZIP_STORED
entries with a pinned timestamp so the artifact is byte-reproducible
(the same determinism contract as the CSV/LaTeX/HTML/SVG sinks,
tests/test_report.py).

Scope is deliberately the reference's: numbers, strings, bold cells.
Anything fancier belongs in the HTML/LaTeX renderings.
"""
from __future__ import annotations

import io
import zipfile
from xml.sax.saxutils import escape

import numpy as np
import pandas as pd

_XMLDECL = '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
_NS_MAIN = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_NS_REL = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_NS_PKG_REL = "http://schemas.openxmlformats.org/package/2006/relationships"
_NS_CT = "http://schemas.openxmlformats.org/package/2006/content-types"


def col_letter(idx: int) -> str:
    """0-based column index -> A1-style letters (0->A, 25->Z, 26->AA)."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _cell_xml(ref: str, value, bold: bool) -> str:
    s = ' s="1"' if bold else ""
    if isinstance(value, np.generic):  # numpy scalars out of DataFrames
        value = value.item()
    if isinstance(value, bool):  # before int: bool is an int subclass
        return f'<c r="{ref}"{s} t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)) and not pd.isna(value):
        if isinstance(value, float):
            v = repr(float(value))
        else:
            v = str(int(value))
        return f'<c r="{ref}"{s}><v>{v}</v></c>'
    if value is None or (isinstance(value, float) and pd.isna(value)):
        return f'<c r="{ref}"{s}/>'
    return (
        f'<c r="{ref}"{s} t="inlineStr"><is><t>{escape(str(value))}</t>'
        "</is></c>"
    )


def _sheet_xml(df: pd.DataFrame, bold_mask: pd.DataFrame | None) -> str:
    cols = list(df.columns)
    rows = ['<row r="1">']
    for j, c in enumerate(cols):
        rows.append(_cell_xml(f"{col_letter(j)}1", str(c), bold=True))
    rows.append("</row>")
    for i in range(len(df)):
        r = i + 2
        rows.append(f'<row r="{r}">')
        for j, c in enumerate(cols):
            bold = bool(bold_mask.iloc[i][c]) if bold_mask is not None \
                else False
            rows.append(_cell_xml(f"{col_letter(j)}{r}", df.iloc[i][c], bold))
        rows.append("</row>")
    return (
        _XMLDECL
        + f'<worksheet xmlns="{_NS_MAIN}"><sheetData>'
        + "".join(rows)
        + "</sheetData></worksheet>"
    )


_STYLES = (
    _XMLDECL
    + f'<styleSheet xmlns="{_NS_MAIN}">'
    '<fonts count="2">'
    '<font><sz val="11"/><name val="Calibri"/></font>'
    '<font><b/><sz val="11"/><name val="Calibri"/></font>'
    "</fonts>"
    '<fills count="2"><fill><patternFill patternType="none"/></fill>'
    '<fill><patternFill patternType="gray125"/></fill></fills>'
    '<borders count="1"><border/></borders>'
    '<cellStyleXfs count="1"><xf/></cellStyleXfs>'
    '<cellXfs count="2"><xf xfId="0"/>'
    '<xf fontId="1" xfId="0" applyFont="1"/></cellXfs>'
    "</styleSheet>"
)


def _sanitize_sheet_name(name: str) -> str:
    for ch in "[]:*?/\\":
        name = name.replace(ch, "_")
    return name[:31] or "Sheet"


def write_xlsx(path: str, sheets: dict[str, pd.DataFrame],
               bold_masks: dict[str, pd.DataFrame] | None = None) -> None:
    """Write ``sheets`` (name -> DataFrame) as one workbook.  Cells that
    are True in the sheet's entry of ``bold_masks`` render bold — the
    highlight_max analogue.  Byte-deterministic output."""
    names = [_sanitize_sheet_name(n) for n in sheets]
    sheet_parts = []
    for k, (orig, name) in enumerate(zip(sheets, names), start=1):
        mask = (bold_masks or {}).get(orig)
        sheet_parts.append(
            (f"xl/worksheets/sheet{k}.xml", _sheet_xml(sheets[orig], mask))
        )

    overrides = "".join(
        f'<Override PartName="/xl/worksheets/sheet{k}.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
        'worksheet+xml"/>'
        for k in range(1, len(names) + 1)
    )
    content_types = (
        _XMLDECL
        + f'<Types xmlns="{_NS_CT}">'
        '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/styles.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>'
        + overrides
        + "</Types>"
    )
    root_rels = (
        _XMLDECL
        + f'<Relationships xmlns="{_NS_PKG_REL}">'
        f'<Relationship Id="rId1" Type="{_NS_REL}/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    sheet_tags = "".join(
        f'<sheet name="{escape(n)}" sheetId="{k}" r:id="rId{k}"/>'
        for k, n in enumerate(names, start=1)
    )
    workbook = (
        _XMLDECL
        + f'<workbook xmlns="{_NS_MAIN}" xmlns:r="{_NS_REL}">'
        f"<sheets>{sheet_tags}</sheets></workbook>"
    )
    wb_rels = (
        _XMLDECL
        + f'<Relationships xmlns="{_NS_PKG_REL}">'
        + "".join(
            f'<Relationship Id="rId{k}" Type="{_NS_REL}/worksheet" '
            f'Target="worksheets/sheet{k}.xml"/>'
            for k in range(1, len(names) + 1)
        )
        + f'<Relationship Id="rId{len(names) + 1}" Type="{_NS_REL}/styles" '
        'Target="styles.xml"/></Relationships>'
    )

    parts = [
        ("[Content_Types].xml", content_types),
        ("_rels/.rels", root_rels),
        ("xl/workbook.xml", workbook),
        ("xl/_rels/workbook.xml.rels", wb_rels),
        ("xl/styles.xml", _STYLES),
    ] + sheet_parts

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        for name, content in parts:
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            z.writestr(info, content)
    with open(path, "wb") as f:
        f.write(buf.getvalue())
