#!/usr/bin/env python3
"""Identity-value reducer: print the value field of each sorted
"key\tvalue" stdin line."""
import sys

for line in sys.stdin:
    line = line.rstrip("\n")
    key, tab, val = line.partition("\t")
    if tab:
        sys.stdout.write(val + "\n")
