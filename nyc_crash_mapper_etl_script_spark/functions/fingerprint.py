"""Row fingerprints for CDC change detection (reference §2.9 C1).

walkmapper/mysql2carto.py:22-35,103-110 builds a ``summary`` string by
concatenating key fields (dates coalesced to '0000-00-00', booleans as
't'/'f') and compares source vs target summaries per id.  Here the
fingerprint is an md5 over a null-safe concat -- constant-width, cheap
to shuffle, and computable identically by any ANSI engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NULL_TOKEN = "0000-00-00"  # walkmapper/mysql2carto.py:24-26 sentinel


def row_fingerprint(*cols: Column, sep: str = "|") -> Column:
    """md5 fingerprint over the given columns; NULLs normalized to the
    reference's sentinel so NULL vs '' changes are detected."""
    parts = [F.coalesce(c.cast("string"), F.lit(NULL_TOKEN)) for c in cols]
    return F.md5(F.concat_ws(sep, *parts))
