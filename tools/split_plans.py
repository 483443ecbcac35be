#!/usr/bin/env python3
"""Split a graft.tools.Explain log into per-query plan files.

Usage: split_plans.py <explain_log> <out_dir> <suffix>
Writes <out_dir>/<query>_<suffix>.txt for every '========== name =========='
section, stripping the sbt '[info] ' prefix.
"""
import re
import sys
import pathlib

log, out_dir, suffix = sys.argv[1], pathlib.Path(sys.argv[2]), sys.argv[3]
out_dir.mkdir(parents=True, exist_ok=True)
name, buf = None, []


def flush():
    if name and buf:
        (out_dir / f"{name}_{suffix}.txt").write_text("".join(buf))


for line in open(log, errors="replace"):
    line = re.sub(r"^\[info\] ", "", line)
    m = re.match(r"^=+ (\S+) =+\s*$", line)
    if m:
        flush()
        name, buf = m.group(1), []
    elif name and not line.startswith(("[error]", "[success]", "[warn]")):
        buf.append(line)
flush()
print(f"wrote {len(list(out_dir.glob(f'*_{suffix}.txt')))} *_{suffix}.txt files")
