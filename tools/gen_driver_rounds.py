#!/usr/bin/env python
"""Regenerate video_stream_processing_spark/plans/driver_rounds.py from the
driver's CORRECTNESS_r*.json artifacts. Run once per round after the new
CORRECTNESS file lands so the registry's oldest-first rotation advances."""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(
    REPO, "video_stream_processing_spark", "plans", "driver_rounds.py"
)


def main() -> None:
    last: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for name, row in json.load(open(f)).items():
            # A recorded row (hash-exact, or rows-only by design) counts as
            # that round's certification; an err row does not.
            if row.get("err") in (None, "no_oracle"):
                last[name] = max(last.get(name, 0), rnd)
    lines = [
        '"""Per-query last driver-certified round, generated from the driver\'s',
        "CORRECTNESS_r*.json artifacts (tools/gen_driver_rounds.py). The driver",
        "verifies ~50 queries per round in dict order; registry._driver_order",
        "enumerates ascending by this round (never-certified = 0, first) so the",
        "stalest certifications refresh each round instead of one hot cohort",
        "(VERDICT r10 task 5). Regenerate after each round's CORRECTNESS lands.\"\"\"",
        "",
        "LAST_DRIVER_ROUND = {",
    ]
    for name in sorted(last):
        lines.append(f'    "{name}": {last[name]},')
    lines.append("}")
    lines.append("")
    with open(OUT, "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {len(last)} entries to {OUT}")


if __name__ == "__main__":
    main()
