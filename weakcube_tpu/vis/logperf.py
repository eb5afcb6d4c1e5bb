"""ASCII report tables (reference cubercnn/vis/logperf.py)."""
from __future__ import annotations

from typing import Dict, Optional, Sequence


def _table(headers, rows) -> str:
    widths = [max(len(str(h)), *(len(str(r[i])) for r in rows)) if rows else len(str(h))
              for i, h in enumerate(headers)]
    def fmt(cells):
        return "| " + " | ".join(str(c).ljust(w) for c, w in zip(cells, widths)) + " |"
    sep = "|" + "|".join("-" * (w + 2) for w in widths) + "|"
    return "\n".join([fmt(headers), sep] + [fmt(r) for r in rows])


def print_ap_table(results: Dict, num_classes: int,
                   class_names: Optional[Sequence[str]] = None) -> None:
    headers = ["metric", "value"]
    rows = [[k, f"{v:.2f}"] for k, v in sorted(results.items())
            if isinstance(v, (int, float)) and v == v]
    print(_table(headers, rows))
    per_class = results.get("per_class_3D") or results.get("per_class_2D") or {}
    if per_class:
        headers = ["category", "AP"]
        rows = []
        for c, v in sorted(per_class.items()):
            name = class_names[c] if class_names and c < len(class_names) else str(c)
            rows.append([name, f"{v:.2f}"])
        print(_table(headers, rows))


def print_ap_analysis_histogram(results: Dict) -> None:
    """AP3D@15/25/50 and near/medium/far bands (logperf.py analysis table)."""
    keys = ["AP3D", "AP3D@15", "AP3D@25", "AP3D@50",
            "AP_near", "AP_medium", "AP_far"]
    rows = [[k, f"{results[k]:.2f}"] for k in keys if k in results]
    print(_table(["analysis", "AP"], rows))
