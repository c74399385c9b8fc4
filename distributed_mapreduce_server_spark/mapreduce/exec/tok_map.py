#!/usr/bin/env python3
"""Tokenizing wordcount mapper: stdin lines -> "token\t1" per
lowercase alphanumeric-run token (the same token definition as
functions.tokens, so SQL oracles can reproduce the job)."""
import re
import sys

TOKEN = re.compile(r"[a-z0-9]+")

for line in sys.stdin:
    for tok in TOKEN.findall(line.lower()):
        sys.stdout.write(tok + "\t1\n")
