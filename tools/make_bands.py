#!/usr/bin/env python3
"""Generate bands.json from N clean graft.Bench output files.

Usage: python3 tools/make_bands.py bands.json run1.json run2.json [...]

For every query and stage row, the band is [min, max] across the runs.
graft.Bench reads bands.json at sweep end and re-times any query row
exceeding 2x its hi edge (the outlier re-run mechanism); stage rows are
recorded for the written baseline only.
"""
import json
import sys


def main(out: str, runs: list[str]) -> None:
    rows: dict[str, list[float]] = {}
    for path in runs:
        with open(path) as f:
            d = json.load(f)
        for section in ("queries", "stages"):
            for name, secs in d.get(section, {}).items():
                rows.setdefault(name, []).append(float(secs))
    bands = {name: [min(v), max(v)] for name, v in sorted(rows.items())}
    with open(out, "w") as f:
        json.dump(bands, f, indent=1)
    print(f"wrote {len(bands)} bands -> {out}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
