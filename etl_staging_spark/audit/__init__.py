"""Audit / change-data-capture layer (SURVEY §2.10).

The reference captures every create/write/unlink as ``auditlog.log`` +
per-field old/new lines (`auditlog/models/rule.py:270-494`), diffs
snapshots with DictDiffer (`:23-48`), vacuums old logs on a retention
cron (`auditlog/models/autovacuum.py:16-38`) and reconstructs records
as-of a timestamp by replaying old values (`smile_audit/models/base.py:
13-44`).

Spark shape: the changelog is an append-only event DataFrame; capture
(C1) derives per-field old/new via a lag window; diffing (C2) compares
two as-of states; retention (C3) is a predicate rewrite; time travel
(C4) is a deterministic last-value-at-or-before-t window ordered by
(ts, event_id). See :mod:`.changelog`.
"""
