"""Replay bench.py's load gate over a RECORDED bench payload.

Usage: python scripts/replay_load_gate.py <payload.json> [out.json]

Recomputes load_factor / load_flagged / clean_record from the
payload's own probe_series and query->block mapping using the SAME
formula as bench.py (worst bracketing probe over the run MEDIAN
probe, LOAD_FLAG_FACTOR threshold). Exists because the gate's
reference changed mid-round-10 (min -> median, see DRIFT.md §7
addendum): records taken under the old reference can be re-graded
without re-running the 10-minute measurement, and the replay is
reproducible from the committed payload alone. The TIMINGS are never
touched — only the flag columns derive."""

from __future__ import annotations

import json
import statistics
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import HEADLINE, LOAD_FLAG_FACTOR, PROBE_EVERY  # noqa: E402


def replay(payload: dict) -> dict:
    names = [n for n in HEADLINE if n in payload["queries"]]
    assert set(names) == set(payload["queries"]), "headline/payload mismatch"
    probe_series = payload["probe_series"]
    # reconstruct each query's probe block exactly as run_attempt does
    block, blk = {}, 0
    for qi, name in enumerate(names):
        if qi and qi % PROBE_EVERY == 0:
            blk += 1
        block[name] = blk
    ref = statistics.median(p for _, p in probe_series)
    lf = {}
    for name, b in block.items():
        bracket = [probe_series[b][1]]
        if b + 1 < len(probe_series):
            bracket.append(probe_series[b + 1][1])
        lf[name] = round(max(bracket) / ref, 2)
    flagged = sorted(n for n, f in lf.items() if f > LOAD_FLAG_FACTOR)
    payload = dict(payload)
    payload["load_factor"] = lf
    payload["load_flagged"] = flagged
    payload["clean_record"] = len(flagged) <= max(1, len(names) // 10)
    payload["gate_replayed"] = "median-reference (scripts/replay_load_gate.py)"
    if payload["clean_record"]:
        payload.pop("load_statement", None)
    return payload


if __name__ == "__main__":
    src = json.load(open(sys.argv[1]))
    out = replay(src)
    txt = json.dumps(out)
    if len(sys.argv) > 2:
        with open(sys.argv[2], "w") as fh:
            fh.write(txt + "\n")
    print(
        f"flagged {len(out['load_flagged'])}/{len(out['queries'])} "
        f"clean={out['clean_record']} total={out['value']}"
    )
