"""Minimal stdlib XLSX reader for the reference's metadata workbook.

The reference loads rule metadata with
``pd.read_excel(path, sheet_name='DPI-1', header=4)``
(read_data.py:123-137).  This environment has no openpyxl, so this
module parses the OOXML container directly with ``zipfile`` +
``xml.etree`` — enough of SpreadsheetML for a metadata sheet: shared
strings, inline strings, numbers, booleans, sparse rows/cells placed by
their absolute ``r`` references (like pandas, which materializes blank
rows, so ``header=4`` means spreadsheet row 5 in both readers).

Deliberately NOT a general XLSX engine: no styles, dates-as-serials,
formula evaluation (cached formula values are read), or charts — rule
metadata needs none of those.
"""

from __future__ import annotations

import re
import zipfile
from pathlib import Path
from xml.etree import ElementTree as ET

_CELL_REF = re.compile(r"([A-Z]+)([0-9]+)")


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _col_index(ref: str) -> int:
    """'A'→0, 'B'→1, …, 'AA'→26 (the column part of a cell reference)."""
    n = 0
    for ch in ref:
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n - 1


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    out = []
    for si in ET.fromstring(data):
        if _local(si.tag) != "si":
            continue
        # plain <t> or rich-text runs <r><t>…</t></r> — concatenate all t
        out.append("".join(
            t.text or "" for t in si.iter() if _local(t.tag) == "t"
        ))
    return out


def _sheet_path(zf: zipfile.ZipFile, sheet_name: str) -> str:
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rid = None
    for el in wb.iter():
        if _local(el.tag) == "sheet" and el.get("name") == sheet_name:
            rid = next(v for k, v in el.attrib.items() if _local(k) == "id")
    if rid is None:
        raise KeyError(f"sheet {sheet_name!r} not found in workbook")
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    for rel in rels:
        if rel.get("Id") == rid:
            target = rel.get("Target")
            return target if target.startswith("xl/") else f"xl/{target}"
    raise KeyError(f"no relationship for sheet {sheet_name!r}")


def read_xlsx_rows(path: str | Path, sheet_name: str) -> list[list[object]]:
    """Dense row-major cell grid of one sheet (None for blank cells),
    rows/columns placed by their absolute spreadsheet positions."""
    with zipfile.ZipFile(path) as zf:
        strings = _shared_strings(zf)
        sheet = ET.fromstring(zf.read(_sheet_path(zf, sheet_name)))
        cells: dict[tuple[int, int], object] = {}
        max_r = max_c = -1
        for c in sheet.iter():
            if _local(c.tag) != "c":
                continue
            m = _CELL_REF.fullmatch(c.get("r", ""))
            if not m:
                continue
            ci, ri = _col_index(m.group(1)), int(m.group(2)) - 1
            ctype = c.get("t", "n")
            value: object = None
            if ctype == "inlineStr":
                value = "".join(
                    t.text or "" for t in c.iter() if _local(t.tag) == "t"
                )
            else:
                v = next((el for el in c if _local(el.tag) == "v"), None)
                if v is not None and v.text is not None:
                    if ctype == "s":
                        value = strings[int(v.text)]
                    elif ctype == "b":
                        value = v.text == "1"
                    elif ctype == "str":
                        value = v.text
                    else:  # numeric
                        f = float(v.text)
                        value = int(f) if f.is_integer() else f
            if value is not None:
                cells[(ri, ci)] = value
                max_r, max_c = max(max_r, ri), max(max_c, ci)
        return [
            [cells.get((r, c)) for c in range(max_c + 1)]
            for r in range(max_r + 1)
        ]


def read_sheet_records(
    path: str | Path, sheet_name: str, header_row: int
) -> list[dict[str, object]]:
    """pandas-read_excel-shaped records: row ``header_row`` (0-based, like
    ``header=N``) is the header; every later row becomes a dict keyed by
    the header strings (blank header cells skipped)."""
    rows = read_xlsx_rows(path, sheet_name)
    if header_row >= len(rows):
        return []
    header = rows[header_row]
    keys = {
        i: str(h).strip() for i, h in enumerate(header)
        if h is not None and str(h).strip()
    }
    out = []
    for row in rows[header_row + 1:]:
        rec = {k: (row[i] if i < len(row) else None) for i, k in keys.items()}
        if any(v is not None for v in rec.values()):
            out.append(rec)
    return out
