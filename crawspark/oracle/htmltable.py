"""HTML table → grid extraction (pandas.read_html-style, through the
extraction core's own DOM tokenizer).

Tables carry the structured data of the web (rankings, specs,
financials); a training pipeline flattens them into aligned text. The
real mechanics are the span attributes:

- ``colspan=N`` duplicates a cell across N grid columns,
- ``rowspan=N`` carries a cell down N grid rows, OFFSETTING the
  following cells in each spanned row (the classic misalignment bug
  when ignored),
- ``th`` and ``td`` are both cells; rows come from ``tr`` in document
  order across thead/tbody/tfoot; nested markup inside a cell
  flattens to its text.

``extract_tables`` returns one grid (list of rows of cell strings)
per ``<table>``. ``make_table_page`` + ``table_grids_expected`` form
the closed-form pair: every table carries one colspan AND one rowspan
on the hash path.
"""

from __future__ import annotations

from crawspark.oracle.dom import parse_html


def extract_tables(html: str) -> list[list[list[str]]]:
    """One expanded grid per <table>, document order. Never raises."""
    root = parse_html(html)
    out: list[list[list[str]]] = []
    for table in root.find_all("table"):
        grid: list[list[str]] = []
        # rowspan carries: {col_index: (remaining_rows, text)}
        pending: dict[int, tuple[int, str]] = {}
        for tr in table.find_all("tr"):
            row: list[str] = []
            col = 0

            def fill_pending(col: int, row: list[str]) -> int:
                while col in pending:
                    left, text = pending[col]
                    row.append(text)
                    if left > 1:
                        pending[col] = (left - 1, text)
                    else:
                        del pending[col]
                    col += 1
                return col

            col = fill_pending(col, row)
            for cell in tr.find_all("td", "th"):
                try:
                    colspan = max(int(cell.attr("colspan") or 1), 1)
                except ValueError:
                    colspan = 1
                try:
                    rowspan = max(int(cell.attr("rowspan") or 1), 1)
                except ValueError:
                    rowspan = 1
                text = " ".join(cell.text().split())
                for _ in range(colspan):
                    row.append(text)
                    if rowspan > 1:
                        pending[col] = (rowspan - 1, text)
                    col += 1
                    col = fill_pending(col, row)
            if row:
                grid.append(row)
        if grid:
            out.append(grid)
    return out


def table_grids_expected(doc_id: int) -> list[list[list[str]]]:
    """Closed form of make_table_page's expanded grids."""
    d = doc_id
    out = []
    for t in range(1 + d % 2):
        out.append([
            [f"h{d}.{t}.0", f"h{d}.{t}.1", f"h{d}.{t}.2"],
            [f"a{d}.{t}", f"span{d}.{t}", f"span{d}.{t}"],
            [f"rsp{d}.{t}", f"b{d}.{t}", f"c{d}.{t}"],
            [f"rsp{d}.{t}", f"e{d}.{t}", f"f{d}.{t}"],
        ])
    return out


def make_table_page(doc_id: int) -> str:
    """Deterministic page: 1 + d%2 tables, each 3x3 plus header, with
    one colspan=2 (row 0) and one rowspan=2 (col 0, rows 1-2), cells
    wrapped in nested markup, plus non-table noise."""
    d = doc_id
    tables = []
    for t in range(1 + d % 2):
        tables.append(f"""
        <p>prose noise {d} {t}</p>
        <table class="data">
          <thead><tr>
            <th>h{d}.{t}.0</th><th><b>h{d}.{t}.1</b></th>
            <th>h{d}.{t}.2</th>
          </tr></thead>
          <tbody>
            <tr><td>a{d}.{t}</td>
                <td colspan="2"><a href="/x">span{d}.{t}</a></td></tr>
            <tr><td rowspan="2">rsp{d}.{t}</td>
                <td>b{d}.{t}</td><td>c{d}.{t}</td></tr>
            <tr><td>e{d}.{t}</td><td>f{d}.{t}</td></tr>
          </tbody>
        </table>""")
    return ("<html><body><h1>tables</h1>"
            + "".join(tables) + "</body></html>")
