#!/usr/bin/env python3
"""Reduce-side-join reducer: stdin is `key<TAB>TAG|...` lines sorted
by (key, value) — so each key's 'C|custkey|segment' dimension record
arrives before its 'O|custkey|orderkey' fact records. Stream-join:
remember the segment, emit `custkey|orderkey|segment` per fact."""
import sys

cur_key = None
segment = None
for raw in sys.stdin:
    raw = raw.rstrip("\n")
    if not raw:
        continue
    key, _, val = raw.partition("\t")
    if key != cur_key:
        cur_key = key
        segment = None
    fields = val.split("|")
    if fields[0] == "C":
        segment = fields[2]
    elif fields[0] == "O" and segment is not None:
        sys.stdout.write(f"{fields[1]}|{fields[2]}|{segment}\n")
