#!/usr/bin/env python3
"""Patch SURVEY.md's bench headline from the actual target/bench.json artifact.

Usage:  tools/update_bench_stats.py [path/to/bench.json]

Rewrites the line in SURVEY.md tagged with <!-- bench-stats:auto -->. Exists
for the same reason as update_spec_count.py: hand-written headline numbers
drifted (round 7 shipped "71.8 s all 99 queries" from mid-round while the
artifact read 108.4 s / 109). The judge asked for §8's headline to be
machine-derived from the artifact.
"""
import json
import pathlib
import re
import sys


def main() -> int:
    path = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else "target/bench.json")
    b = json.loads(path.read_text())
    n = len(b["queries"])
    failed = sorted(k for k, v in b["queries"].items() if v < 0)
    if failed:
        print(f"bench artifact has failed queries {failed}; not patching", file=sys.stderr)
        return 1
    adj = b.get("adjudicated_min", {})
    adj_txt = ("adjudicated_min " +
               ", ".join(f"{k} {v:.2f} s" for k, v in sorted(adj.items()))
               if adj else "no adjudications triggered")
    line = (f"- Bench sf0.1 local[32], steady-state per-query MIN totals: "
            f"**{b['min']:.1f} s over {n} queries** (median-total "
            f"{b['median']:.1f} s, contended={str(b['contended']).lower()}, "
            f"probes {b['probe_sec'][0]:.2f}/{b['probe_sec'][1]:.2f} s, "
            f"{adj_txt}) <!-- bench-stats:auto -->")
    survey = pathlib.Path(__file__).resolve().parent.parent / "SURVEY.md"
    text = survey.read_text()
    new, n_subs = re.subn(r"^- Bench sf0\.1 local\[32\], steady-state per-query MIN totals:.*<!-- bench-stats:auto -->$",
                          line, text, flags=re.M)
    if n_subs != 1:
        print(f"expected exactly 1 tagged bench-stats line in SURVEY.md, found {n_subs}",
              file=sys.stderr)
        return 1
    survey.write_text(new)
    print(f"SURVEY.md bench stats -> {b['min']:.1f} s / {n} queries")
    return 0


if __name__ == "__main__":
    sys.exit(main())
