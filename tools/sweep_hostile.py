"""Full-registry hostile-corpus sweep: every registry query against every
adversarial fixture corpus, with FULL DuckDB-oracle parity (not just
crash-freedom).

This is the round-5/6 methodology that found the degenerate-argmin,
sketch-overflow, and poisoned-JSON crash classes, packaged so future rounds
re-run it in one command:

    python tools/sweep_hostile.py            # parity sweep (default)
    python tools/sweep_hostile.py --crash    # crash-freedom only (faster)
    python tools/sweep_hostile.py adversarial_ord_sf   # one corpus only

Any ERR/MISMATCH it prints is a finding: fix the contract in BOTH engines,
then pin the query on that corpus in tests/test_degenerate_parity.py.
The pinned subset there is the regression net; this sweep is the probe that
feeds it.

The STREAMING layer has no oracle to sweep against; its hostile-input
contract (NULL seq/key/verdict, corrupt payload bytes, watermark-poisoning
timestamps) lives as scenario pins in tests/test_streaming_hostile.py —
run `pytest tests/test_streaming_hostile.py` as the streaming-mode
equivalent of this sweep.
"""

from __future__ import annotations

import pathlib
import sys
import threading
import time
from concurrent.futures import ThreadPoolExecutor

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pulsar_pekko_streams_example_spark.plans.registry import (  # noqa: E402
    REGISTRY,
    all_queries,
)

all_queries()  # force registration

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

FIXTURES = [
    "adversarial_text_sf",
    "adversarial_emb_sf",
    "adversarial_ev_sf",
    "adversarial_ord_sf",
    "adversarial_dim_sf",
    "adversarial_docid_sf",
    "adversarial_ts_sf",
    "adversarial_unicode_sf",
    "adversarial_all_sf",
    "degenerate_sf",
]


class _FakeTmp:
    """Minimal stand-in for pytest's tmp_path_factory.

    Fixture dirs are wiped before reuse: the base survives across sweep runs
    (it is a fixed /tmp path), and a leftover corpus from a previous run made
    the fixtures' copytree abort with FileExistsError — worse, a pipeline
    like ``sweep | grep | tail`` reports the TAIL's exit code, so the crash
    looked like a clean empty run (round-8 finding)."""

    def __init__(self, base: str) -> None:
        self.base = pathlib.Path(base)
        self.n = 0

    def mktemp(self, name: str) -> pathlib.Path:
        import shutil

        self.n += 1
        p = self.base / f"{name}_{self.n}"
        shutil.rmtree(p, ignore_errors=True)
        p.mkdir(parents=True, exist_ok=True)
        return p


def _unwrap(fixture):
    fn = fixture
    while hasattr(fn, "__wrapped__"):
        fn = fn.__wrapped__
    return fn


def main() -> None:
    crash_only = "--crash" in sys.argv
    # Positional NAME [NAME...] args sweep only the named corpora (fast
    # targeted rerun after fixing a finding); default sweeps every FIXTURES
    # entry.  Unrecognized --flags are rejected so a typo'd selector can't be
    # silently ignored.
    bad_flags = [a for a in sys.argv[1:] if a.startswith("--") and a != "--crash"]
    if bad_flags:
        sys.exit(
            f"unknown flag(s) {bad_flags}; fixtures are positional args "
            f"(e.g. `sweep_hostile.py adversarial_docid_sf`), the only flag "
            f"is --crash"
        )
    wanted = [a for a in sys.argv[1:] if not a.startswith("--")]
    selected = [f for f in FIXTURES if not wanted or f in wanted]
    unknown = [w for w in wanted if w not in FIXTURES]
    if unknown:
        sys.exit(f"unknown fixture(s) {unknown}; choose from {FIXTURES}")

    from pulsar_pekko_streams_example_spark.session import get_spark

    import tests.test_degenerate_parity as fixtures_mod
    from pulsar_pekko_streams_example_spark.verify import compare

    spark = get_spark(app_name="hostile-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = _FakeTmp("/tmp/hostile_sweep")
    corpora: dict[str, str] = {}
    for name in selected:
        fix = getattr(fixtures_mod, name, None)
        if fix is None:
            print(f"SKIP missing fixture {name}")
            continue
        corpora[name] = _unwrap(fix)(spark, tmp)

    import duckdb

    findings: list[tuple[str, str, str]] = []
    t0 = time.time()
    for corpus, sf in corpora.items():
        con = duckdb.connect()
        for t in TABLES:
            path = pathlib.Path(sf) / f"{t}.parquet"
            pattern = f"{path}/*.parquet" if path.is_dir() else str(path)
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pattern}')"
            )
        duck_lock = threading.Lock()  # duckdb connections are not thread-safe

        def check(qname: str) -> tuple[str, str, str] | None:
            spec = REGISTRY[qname]
            try:
                df = spec.build(spark, sf)
                if crash_only or spec.oracle is None:
                    df.collect()
                    return None
                with duck_lock:
                    rel = con.sql(spec.oracle)
                    problems = compare(df, rel)
                if problems:
                    return (corpus, qname, "MISMATCH: " + "; ".join(problems)[:200])
                return None
            except Exception as e:  # noqa: BLE001 — a sweep logs, never dies
                return (corpus, qname, "ERR: " + str(e).splitlines()[0][:200])

        with ThreadPoolExecutor(max_workers=8) as pool:
            for r in pool.map(check, sorted(REGISTRY)):
                if r:
                    findings.append(r)
                    print("FINDING", *r, flush=True)
        con.close()
        print(
            f"== {corpus} done ({time.time() - t0:.0f}s), findings: {len(findings)}",
            flush=True,
        )
    print("TOTAL FINDINGS:", len(findings))
    sys.exit(1 if findings else 0)


if __name__ == "__main__":
    main()
