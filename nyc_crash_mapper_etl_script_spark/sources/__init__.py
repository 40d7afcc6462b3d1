"""Sources and sinks (reference §2.1 S1-S13), reformulated for
immutable columnar storage."""
