#!/usr/bin/env python3
"""Reduce-side-join mapper (Hadoop-streaming contract): every input
line is `TAG|key|payload...`; emit `paddedkey<TAB>line` so all records
of one key — customer and orders alike — meet in one sorted reduce
group, with the dimension tag 'C' sorting before the fact tag 'O'."""
import sys

for raw in sys.stdin:
    raw = raw.rstrip("\n")
    if not raw:
        continue
    parts = raw.split("|")
    key = parts[1].zfill(12)
    sys.stdout.write(f"{key}\t{raw}\n")
