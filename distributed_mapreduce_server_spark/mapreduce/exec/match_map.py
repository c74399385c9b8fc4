#!/usr/bin/env python3
"""Grep mapper: emit "1\t<line>" for stdin lines containing the
pattern (argv[1], case-insensitive substring)."""
import sys

pattern = sys.argv[1].lower() if len(sys.argv) > 1 else "data"
for line in sys.stdin:
    line = line.rstrip("\n")
    if line and pattern in line.lower():
        sys.stdout.write("1\t" + line + "\n")
