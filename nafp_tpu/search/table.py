"""Plain-text results table (counterpart of the curses PrintTable,
``eval/utils/print_table.py:7-110`` — same rows/columns, no terminal
takeover so it logs cleanly)."""
from __future__ import annotations

from typing import Sequence

import numpy as np

ROW_NAMES = ("Top1 exact", "Top1 near", "Top3 exact", "Top10 exact")


def format_results_table(seq_lens: Sequence[int], rates: np.ndarray,
                         ms_per_query: float) -> str:
    secs = [(int(s) + 1) / 2.0 for s in seq_lens]  # segments -> seconds
    head = "  ".join(f"{s:>6}" for s in seq_lens)
    sec_row = "  ".join(f"{s:>5.1f}s" for s in secs)
    lines = [
        "=" * (14 + 8 * len(seq_lens)),
        f"{'segments':>12}  {head}",
        f"{'duration':>12}  {sec_row}",
        "-" * (14 + 8 * len(seq_lens)),
    ]
    for name, row in zip(ROW_NAMES, np.asarray(rates)):
        cells = "  ".join(f"{v:>6.2f}" for v in row)
        lines.append(f"{name:>12}  {cells}")
    lines.append("-" * (14 + 8 * len(seq_lens)))
    lines.append(f"avg search time: {ms_per_query:.2f} ms/query")
    lines.append("=" * (14 + 8 * len(seq_lens)))
    return "\n".join(lines)


def print_results_table(seq_lens, rates, ms_per_query: float) -> None:
    print(format_results_table(seq_lens, rates, ms_per_query))
