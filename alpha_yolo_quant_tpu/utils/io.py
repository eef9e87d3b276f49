"""Calibration-file IO in the reference's text formats.

max_a.txt lines are "name: value" (parsed by reference utils/max_a.py:1-7,
written by utils/stage_5_common_func.py:11-26 with python float repr).
max_a_all.txt holds the raw per-image statistic lists (reference
stage_4.py:1007-1011 / stage_5.py:12-28).
"""

from __future__ import annotations

from typing import Dict, List


def write_max_a(path: str, max_a: Dict[str, float]) -> None:
    with open(path, "w") as f:
        f.write("start: 1.0\n")
        for name, value in max_a.items():
            if name == "start":
                continue
            f.write(f"{name}: {value}\n")


def read_max_a(path: str) -> Dict[str, float]:
    out: Dict[str, float] = {}
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            name, value = line.split(": ")
            out[name] = float(value)
    return out


def write_max_a_all(path: str, records: Dict[str, List[float]]) -> None:
    with open(path, "w") as f:
        for name, values in records.items():
            f.write(f"{name}: {[float(v) for v in values]}\n")


def read_max_a_all(path: str) -> Dict[str, List[float]]:
    out: Dict[str, List[float]] = {}
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            name, rest = line.split(": ", 1)
            rest = rest.strip().strip("[]")
            out[name] = [float(v) for v in rest.split(",") if v.strip()]
    return out
