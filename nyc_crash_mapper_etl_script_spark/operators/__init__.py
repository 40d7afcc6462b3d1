"""Composed dataflow operators re-expressing the reference's
UPDATE/INSERT/orchestration semantics functionally."""
