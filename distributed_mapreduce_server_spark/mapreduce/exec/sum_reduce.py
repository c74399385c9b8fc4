#!/usr/bin/env python3
"""Summing reducer over sorted stdin: consecutive "key\tn" lines are
folded into "key\ttotal" (relies on the sorted-stream contract; sums
values rather than counting lines, so combiner output is legal input)."""
import sys

cur, total = None, 0
for line in sys.stdin:
    line = line.rstrip("\n")
    if not line:
        continue
    key, _, val = line.partition("\t")
    n = int(val) if val else 1
    if key != cur:
        if cur is not None:
            sys.stdout.write(f"{cur}\t{total}\n")
        cur, total = key, 0
    total += n
if cur is not None:
    sys.stdout.write(f"{cur}\t{total}\n")
