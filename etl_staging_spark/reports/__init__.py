"""Assembled end-to-end reports on top of the engine layer.

Each report composes multiple SURVEY §2 operators the way the
reference's concrete reports do:

- :mod:`.general_ledger` — column groups x (account sums under the
  'normal' date scope with initial balances, unaffected-earnings fold,
  running-balance detail): `account_general_ledger.py:203-634`.
- :mod:`.aged_partner` — reconciled-as-of residuals (lateral ->
  pre-agg + left join), aging-bucket pivot, non-zero HAVING:
  `account_aged_partner_balance.py:127-221`.
"""
