"""The expression-engine layer — the heart of the reference's report
engine, re-expressed Spark-first.

The reference dispatches report expressions to six pluggable formula
engines (`account_reports/models/account_report.py:2500-2533`):

- E1 ``domain``        — filter+aggregate with sum / sum_if_pos /
  sum_if_neg / count_rows subformulas (:mod:`.formula`)
- E2 ``tax_tags``      — signed tag sums with invert flags (:mod:`.formula`)
- E3 ``account_codes`` — the '123D\\(1234) + 56 - 416C' prefix DSL
  (:mod:`.account_codes`)
- E4 ``external``      — manual values, sum / most_recent (:mod:`.formula`)
- E5 ``custom``        — named handler dispatch (:mod:`.custom`)
- E6 ``aggregation``   — cross-line arithmetic with a fixpoint
  substitution loop, bounds and zero-division conventions
  (:mod:`.aggregation`)

Engines E1-E5 build lazy DataFrames (one filtered aggregate per
formula batch — Catalyst fuses filters into the shared ledger scan);
E6 is deliberately driver-side Python over the collected scalars,
exactly like the reference: its inputs are per-column-group totals
(O(report lines), not O(data)), so distributing it would be noise.

:mod:`.ledger` maps the driver's TPC-H-ish tables onto the
account_move_line-shaped fact every engine consumes;
:mod:`.options` ports the options/date-scope/column-group pipeline.
"""
