"""Interleaved A/B of the fact-scan respread (`engines/ledger.py
SPREAD_FACT`, r16): single-row-group scans serialize the whole
broadcast-join + decimal-conv + partial-aggregate map side on one core;
the respread spreads surviving scan rows to defaultParallelism (no-op
at real scale).

VERDICT RECORDED IN OPTIMIZATION_r16.md: with the flag gating
move_lines itself, this A/B measured a +19% net LOSS across the 14
ledger entries below (spread 16.7 s vs plain 14.0 s, losing on 10/14)
— the consumers' partial aggregates collapse rows before any exchange,
and per-scope collect jobs re-pay the shuffle. The move_lines gate was
REVERTED; SPREAD_FACT now gates only the single-pass heavy-aggregate
consumers (a1_hash_agg, −59% with the keyed spread), so re-running
this tool today A/Bs exactly those.

Protocol: ab_ansi.py's (one session, same JVM/page-cache/JIT, per-arm
warmup, N interleaved passes, best-of per arm), with the noop sink as
the timed action (bench.py's methodology).

Usage: python tools/ab_respread.py [sf_dir] [rounds] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from etl_staging_spark.session import get_spark
from etl_staging_spark.engines import ledger

DEFAULT = [
    "a1_hash_agg",
    "hg_column_groups",
    "gl_report",
    "es_report",
    "aged_report",
    "e3_account_codes",
    "e4_carryover",
    "m4_serial_rebuild",
    "a9_ledger_netting",
    "w1_gl_initial_and_period",
    "a3_aged_bucket_pivot",
    "analytic_report",
    "hier_rollup",
    "w2_running_balance",
]


def _run(spark, fn, sf_dir) -> float:
    t0 = time.monotonic()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    names = sys.argv[3:] or DEFAULT
    spark = get_spark("ab-respread")
    qs = entry.queries()

    # move_lines memoizes on the EFFECTIVE spread (ledger.py keys on
    # `spread and SPREAD_FACT` since r17), so flipping the flag selects
    # the right cached plan per arm. Belt-and-braces: clear the memo on
    # every flip anyway so a stale entry can never time the wrong arm
    # again (the r16 ADVICE bug), and restore the flag on ANY exit so an
    # exception can't leave the module in the last arm's state.
    def _arm(on: bool) -> None:
        ledger.SPREAD_FACT = on
        ledger._LEDGER_CACHE.clear()

    results: dict[str, dict] = {}
    try:
        for name in names:
            fn = qs[name]
            for on in (True, False):
                _arm(on)
                _run(spark, fn, sf_dir)
            a, b = [], []
            for _ in range(rounds):
                _arm(True)
                a.append(_run(spark, fn, sf_dir))
                _arm(False)
                b.append(_run(spark, fn, sf_dir))
            results[name] = {"spread_best": round(min(a), 3), "plain_best": round(min(b), 3)}
            print(
                f"{name}: spread={min(a):.3f} plain={min(b):.3f} "
                f"delta={(min(a) - min(b)) / min(b) * 100:+.1f}%",
                flush=True,
            )
            spark.catalog.clearCache()
    finally:
        _arm(True)
    on_sum = sum(r["spread_best"] for r in results.values())
    off_sum = sum(r["plain_best"] for r in results.values())
    print(json.dumps({"spread_sum": round(on_sum, 3), "plain_sum": round(off_sum, 3)}))


if __name__ == "__main__":
    main()
