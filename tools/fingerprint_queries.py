"""Maintain QUERY_FINGERPRINTS.json — the change-awareness ledger of the
driver-check rotation (plans/registry.py).

The ledger maps each registry query to the fingerprint its code had when each
round's driver correctness check ran: ``{name: {str(round): fingerprint}}``.
``registry._fresh_checked`` treats a green CORRECTNESS row for round R as
attesting the CURRENT code only if the recorded round-R fingerprint equals
``registry.query_fingerprint(name)`` now — so a query edited after its last
green row automatically re-fronts the export order.

Usage (run from the repo root):

    python tools/fingerprint_queries.py            # print current fingerprints
    python tools/fingerprint_queries.py --update   # record them for the
                                                   # UPCOMING round (= max
                                                   # CORRECTNESS round + 1);
                                                   # run before every commit
                                                   # that touches queries

Bootstrap (one-time, round 6): rounds 1-5 were reconstructed from git — each
round's artifact commit ("round N: verdict/advice/correctness/bench") touches
only artifact files, so its tree IS the code that round's driver checked:

    for N in 1 2 3 4 5; do
      C=$(git log --diff-filter=A --format=%H -- CORRECTNESS_r0$N.json)
      git worktree add /tmp/fp_r$N $C
      (cd /tmp/fp_r$N && python /root/repo/tools/fingerprint_queries.py) \
          > /tmp/fp_r$N.json
      git worktree remove /tmp/fp_r$N
    done
    # then merge the five {name: fp} maps into {name: {round: fp}}

The script imports the registry of the repo in CWD (so a git worktree of a
historical commit fingerprints THAT tree); when that registry predates
``query_fingerprint`` (rounds 1-5), a byte-equivalent local fallback computes
the same hash.
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import re
import sys
import types
from pathlib import Path

sys.path.insert(0, os.getcwd())

import pulsar_pekko_streams_example_spark.plans  # noqa: F401  (registration)
from pulsar_pekko_streams_example_spark.plans import registry


def _fallback_code_names(code) -> set[str]:
    names = set(code.co_names)
    for const in code.co_consts:
        if isinstance(const, types.CodeType):
            names |= _fallback_code_names(const)
    return names


def _fallback_fingerprint(name: str) -> str:
    """Byte-equivalent copy of registry.query_fingerprint for historical
    trees that predate it.  MUST stay in lockstep with the registry version
    (hash inputs and ordering) or bootstrap fingerprints would all read as
    stale."""
    spec = registry.REGISTRY[name]
    fn = spec.build
    parts = [inspect.getsource(fn), spec.oracle or "", spec.doc]
    pkg = "pulsar_pekko_streams_example_spark"
    for ref in sorted(_fallback_code_names(fn.__code__)):
        obj = fn.__globals__.get(ref)
        if obj is None:
            continue
        if isinstance(obj, types.ModuleType):
            if obj.__name__.startswith(pkg) and getattr(obj, "__file__", None):
                parts.append(f"{ref}::{Path(obj.__file__).read_text()}")
        elif callable(obj):
            if getattr(obj, "__module__", "").startswith(pkg):
                try:
                    parts.append(f"{ref}::{inspect.getsource(obj)}")
                except (OSError, TypeError):
                    parts.append(f"{ref}::{obj!r}")
        else:
            parts.append(f"{ref}::{obj!r}")
    return hashlib.sha256("\n".join(parts).encode()).hexdigest()


def current_fingerprints() -> dict[str, str]:
    fp = getattr(registry, "query_fingerprint", _fallback_fingerprint)
    return {name: fp(name) for name in sorted(registry.REGISTRY)}


def upcoming_round(root: Path) -> int:
    rounds = [
        int(m.group(1))
        for p in root.glob("CORRECTNESS_r*.json")
        if (m := re.match(r"CORRECTNESS_r(\d+)\.json", p.name))
    ]
    return max(rounds, default=0) + 1


def main() -> None:
    root = Path(os.getcwd())
    fps = current_fingerprints()
    if "--update" not in sys.argv:
        print(json.dumps(fps, indent=0, sort_keys=True))
        return
    ledger_path = root / "QUERY_FINGERPRINTS.json"
    try:
        ledger = json.loads(ledger_path.read_text())
    except (OSError, ValueError):
        ledger = {}
    # record the upcoming round AND the one after it: when the driver drops
    # CORRECTNESS_r{N}.json at round end, `upcoming` jumps to N+1 and the
    # ledger gate (tests/test_registry.py) would read red until the next
    # manual --update even though the code is unchanged — the N+1 entry is
    # the same fingerprint of the same code, so pre-recording it keeps the
    # suite green across the round boundary.  Any round-(N+1) edit refreshes
    # it through the normal update-before-commit habit.
    nxt = upcoming_round(root)
    changed = 0
    for rnd in (str(nxt), str(nxt + 1)):
        for name, fp in fps.items():
            entry = ledger.setdefault(name, {})
            if entry.get(rnd) != fp:
                entry[rnd] = fp
                changed += 1
    ledger_path.write_text(json.dumps(ledger, indent=0, sort_keys=True) + "\n")
    print(
        f"rounds {nxt}+{nxt + 1}: {changed} fingerprints recorded -> "
        f"{ledger_path.name}"
    )


if __name__ == "__main__":
    main()
