"""xlsxwriter stand-in for the reference's per-class metric export
(basics/test.py:271-297). Collects writes and dumps them as CSV next to the
requested .xlsx path — enough for the reference eval to complete and for the
A/B harness to read the numbers back."""

from pathlib import Path


class _Worksheet:
    def __init__(self):
        self.cells = {}

    def write(self, row, col, value, *args):
        self.cells[(row, col)] = value


class Workbook:
    def __init__(self, filename, options=None):
        self.filename = str(filename)
        self._sheets = []

    def add_worksheet(self, name=None):
        ws = _Worksheet()
        self._sheets.append(ws)
        return ws

    def close(self):
        out = Path(self.filename).with_suffix(".csv")
        lines = []
        for ws in self._sheets:
            if not ws.cells:
                continue
            rows = max(r for r, _ in ws.cells) + 1
            cols = max(c for _, c in ws.cells) + 1
            for r in range(rows):
                lines.append(",".join(
                    str(ws.cells.get((r, c), "")) for c in range(cols)))
        out.write_text("\n".join(lines) + "\n")
