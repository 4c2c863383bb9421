"""Deterministic test-file sharding for CI: print the test files belonging
to shard ``argv[1]`` of ``argv[2]`` (round-robin over the sorted file list,
so each group gets a mix of heavy and light files and the full suite's
~40 min splits into roughly even parallel slices).

Usage: python tests/ci_shard.py <group> <total>
"""

import sys
from pathlib import Path


def shard(group: int, total: int) -> list[str]:
    files = sorted(p.name for p in Path(__file__).parent.glob("test_*.py"))
    return [f"tests/{f}" for i, f in enumerate(files) if i % total == group]


if __name__ == "__main__":
    group, total = int(sys.argv[1]), int(sys.argv[2])
    if not 0 <= group < total:
        raise SystemExit(f"group {group} out of range for total {total}")
    print(" ".join(shard(group, total)))
