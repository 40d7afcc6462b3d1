"""End-to-end pipeline DAGs (reference §3 lifecycle)."""
