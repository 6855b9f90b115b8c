#!/usr/bin/env python3
"""Split graft.Explain output into per-query plan files.

Usage: python3 tools/split_plans.py <explain_log> <outdir> <suffix>
Writes <outdir>/<query>_<suffix>.txt for each '========== name ==========' block.
Dev-only tooling for the r12 optimization round's plans/ deliverable.
"""
import os
import re
import sys

log, outdir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
os.makedirs(outdir, exist_ok=True)
text = open(log, errors="replace").read()
# strip sbt/log4j noise lines
lines = [l for l in text.splitlines()
         if not re.match(r"^\[(info|warn|error|success)\]", l)
         and not re.match(r"^\d\d/\d\d/\d\d \d\d:\d\d:\d\d", l)]
blocks = re.split(r"^========== (\S+) ==========$",
                  "\n".join(lines), flags=re.M)
# blocks: [pre, name1, body1, name2, body2, ...]
for i in range(1, len(blocks) - 1, 2):
    name, body = blocks[i], blocks[i + 1].strip("\n")
    with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
        f.write(body + "\n")
    print(f"wrote {name}_{suffix}.txt ({len(body)} chars)")
