"""Regenerate registry._DRIVER_SAMPLED from the CORRECTNESS_r*.json
files: run after each driver round, paste the emitted block over the
frozenset literal in registry.py so the next round's 50-key prefix
rotates onto still-never-sampled keys.

Usage: python scripts/update_sampled.py
"""

from __future__ import annotations

import glob
import json
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main() -> None:
    sampled: set[str] = set()
    for f in glob.glob(str(ROOT / "CORRECTNESS_r*.json")):
        sampled.update(json.load(open(f)).keys())

    from distributed_mapreduce_server_spark import registry

    unknown = sampled - set(registry._QUERIES)
    if unknown:
        print(f"# WARNING: sampled keys not in registry: {sorted(unknown)}")
    never = [k for k in registry._QUERIES if k not in sampled]
    print(f"# {len(sampled)} sampled / {len(never)} never-sampled")
    print("_DRIVER_SAMPLED = frozenset(\n    {")
    for k in sorted(sampled):
        print(f'        "{k}",')
    print("    }\n)")


if __name__ == "__main__":
    main()
