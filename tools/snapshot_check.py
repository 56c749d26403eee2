#!/usr/bin/env python
"""Pre-snapshot test gate: run the test chunk(s) owning every file
touched since the last commit (VERDICT r4 "Next round" #7).

The round-4 snapshot shipped a RED suite because a kernel edit landed
without re-running its owning chunk. This gate makes that structurally
hard: ``make check`` (or ``python tools/snapshot_check.py``) diffs the
working tree + index against HEAD, maps each touched file to the pytest
chunk that owns it, and runs the union. Commit only on a green run.

Mapping rules (first match wins; unknown framework files escalate to the
FULL suite rather than silently skipping):

    instageo_tpu/ops/**                  -> ops_tests + model_tests
    instageo_tpu/models/**               -> model_tests + ops_tests
    instageo_tpu/train|parallel|configs  -> model_tests
    instageo_tpu/data/**                 -> data_tests
    instageo_tpu/serve/**                -> serve_tests
    instageo_tpu/webapp/**               -> webapp_tests
    instageo_tpu/apps/**                 -> apps_tests
    instageo_tpu/utils/**                -> utils_tests
    instageo_tpu/native/**               -> data_tests (decoder parity)
    bench.py | benchmarks/**             -> bench_tests
    __graft_entry__.py                   -> model_tests
    tests/<chunk>/**                     -> that chunk
    docs/configs-only/md-only changes    -> no tests

Usage:
    python tools/snapshot_check.py            # run owed chunks
    python tools/snapshot_check.py --list     # print them, don't run
    python tools/snapshot_check.py --since <rev>   # diff vs <rev>
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (prefix, chunks). First match wins.
_RULES = [
    ("instageo_tpu/ops/", ("ops_tests", "model_tests")),
    ("instageo_tpu/models/", ("model_tests", "ops_tests")),
    ("instageo_tpu/train/", ("model_tests",)),
    ("instageo_tpu/parallel/", ("model_tests",)),
    ("instageo_tpu/configs/", ("model_tests",)),
    ("instageo_tpu/data/", ("data_tests",)),
    ("instageo_tpu/native/", ("data_tests",)),
    ("instageo_tpu/serve/", ("serve_tests",)),
    ("instageo_tpu/webapp/", ("webapp_tests",)),
    ("instageo_tpu/apps/", ("apps_tests",)),
    ("instageo_tpu/utils/", ("utils_tests",)),
    ("benchmarks/", ("bench_tests",)),
    ("bench.py", ("bench_tests",)),
    ("__graft_entry__.py", ("model_tests",)),
]

_DOC_SUFFIXES = (".md", ".rst", ".txt", ".json", ".yaml.license")
_NO_TEST_PREFIXES = ("docs/", "deploy/", "notebooks/", "examples/",
                     "experiments/", "tools/", ".github/")


def changed_files(since: str) -> list[str]:
    out = subprocess.run(
        ["git", "diff", "--name-only", since], cwd=REPO,
        capture_output=True, text=True, check=True).stdout.split()
    untracked = subprocess.run(
        ["git", "ls-files", "--others", "--exclude-standard"], cwd=REPO,
        capture_output=True, text=True, check=True).stdout.split()
    return sorted(set(out) | set(untracked))


def chunks_for(files: list[str]) -> tuple[set[str], bool]:
    """-> (chunk names, full_suite_required)."""
    chunks: set[str] = set()
    for f in files:
        if f.endswith(_DOC_SUFFIXES) or f.startswith(_NO_TEST_PREFIXES):
            continue
        if f.startswith("tests/"):
            parts = f.split("/")
            if len(parts) >= 2 and parts[1].endswith("_tests"):
                chunks.add(parts[1])
            continue
        for prefix, owned in _RULES:
            if f.startswith(prefix) or f == prefix:
                chunks.update(owned)
                break
        else:
            if f.startswith("instageo_tpu/"):
                # Unmapped framework file: the safe answer is everything.
                return chunks, True
    return chunks, False


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--since", default="HEAD")
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args()

    files = changed_files(args.since)
    chunks, full = chunks_for(files)
    if full:
        targets = ["tests/"]
    elif chunks:
        targets = sorted(f"tests/{c}" for c in chunks)
    else:
        print("snapshot_check: no test-owning changes since "
              f"{args.since}; nothing to run")
        return 0

    print(f"snapshot_check: {len(files)} changed file(s) -> {targets}")
    if args.list:
        return 0
    rc = 0
    for t in targets:  # chunked: one process per directory (CLAUDE.md —
        # the full suite in one process can outlive shell timeouts)
        r = subprocess.run([sys.executable, "-m", "pytest", t, "-q"],
                          cwd=REPO)
        rc = rc or r.returncode
    print("snapshot_check:", "GREEN" if rc == 0 else "RED")
    return rc


if __name__ == "__main__":
    sys.exit(main())
