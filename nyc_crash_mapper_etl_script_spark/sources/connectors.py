"""Live API connector shims for Socrata SODA and CARTO SQL (S1/S3).

The reference pulls its feed with a requests GET against the SODA API
(``$where``/``$order``/``$limit`` params, main.py:89-97) and reads/
writes CARTO through its SQL API (GET for SELECTs, main.py:116-124;
POST for DML, main.py:536-552).  A Spark cluster doesn't stream rows
through the driver's HTTP socket, so the engine-side contract is
FETCH-TO-LANDING:

  1. the client serializes the pushdown (where/order/limit) into the
     request params -- the same strings the reference builds;
  2. the paged response lands as JSON-lines files in a landing dir
     (one file per page, written atomically via rename);
  3. ``spark.read.schema(...).json(landing_dir)`` scans the landing
     dir -- from here on Catalyst owns pruning/pushdown.

At 100 TB the landing dir is object storage and step 2 runs on many
fetchers (one per date-range shard via :meth:`SodaClient.shards`);
the Spark plan is identical either way, which is the point.

Transport is injectable and dependency-free: the default uses stdlib
``urllib`` only, and tests swap in a directory-backed fake "feed
server" that records the params it was asked for -- proving the
pushdown contract without a network.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession

#: transport(url, params) -> parsed JSON body (list for SODA,
#: {"rows": [...]} for CARTO).  Injectable for tests/offline runs.
Transport = Callable[[str, dict], object]


def http_json_transport(url: str, params: dict) -> object:
    """Default GET transport on stdlib urllib (no requests dep)."""
    from urllib.parse import urlencode
    from urllib.request import urlopen

    with urlopen(f"{url}?{urlencode(params)}", timeout=60) as resp:
        return json.loads(resp.read().decode("utf-8"))


def _land_jsonl(landing_dir: str, rows: Iterable[dict], page: int) -> str:
    """Write one page of rows as a JSON-lines part file, atomically
    (tmp write + rename) so a concurrent Spark scan never sees a
    half-written file."""
    os.makedirs(landing_dir, exist_ok=True)
    final = os.path.join(landing_dir, f"part-{page:05d}.jsonl")
    tmp = os.path.join(landing_dir, f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(tmp, final)
    return final


class SodaClient:
    """Socrata SODA API reader with reference-parity params.

    Mirrors get_soda_data (main.py:89-97): ``$where`` date predicate,
    ``$order``, high ``$limit`` ("we routinely see 200-500 crashes in
    a single day"), optional ``$$app_token``; adds ``$offset`` paging
    the reference skips (it trusts one 50k page -- a silent truncation
    at scale) and ``$select=':*,*'`` for the system columns
    (main.py:834-835).
    """

    def __init__(
        self,
        base_url: str,
        app_token: str | None = None,
        page_size: int = 50_000,
        transport: Transport = http_json_transport,
    ) -> None:
        self.base_url = base_url
        self.app_token = app_token
        self.page_size = page_size
        self.transport = transport

    def _params(self, where: str | None, order: str | None, offset: int) -> dict:
        params: dict = {"$select": ":*,*", "$limit": str(self.page_size)}
        if offset:
            params["$offset"] = str(offset)
        if where:
            params["$where"] = where
        if order:
            params["$order"] = order
        if self.app_token:
            params["$$app_token"] = self.app_token
        return params

    def fetch_to_landing(
        self,
        landing_dir: str,
        where: str | None = None,
        order: str | None = None,
        max_pages: int = 10_000,
        use_cache: bool = False,
    ) -> int:
        """Page through the feed and land every page; returns the row
        count.  A dict response is the SODA error envelope
        (main.py:102-104) -> raise, never land partial garbage.

        ``use_cache=True``: a completed landing whose ``_manifest``
        records the SAME (where, order, page_size) is reused without
        any HTTP -- the repeated-nightly-window case (the reference
        re-fetches its whole 2-month window every run).  The manifest
        is written only after the last page lands, so an interrupted
        fetch never masquerades as complete; param changes refetch
        from scratch."""
        key = {"where": where, "order": order, "page_size": self.page_size}
        manifest = os.path.join(landing_dir, "_manifest.json")
        if use_cache and os.path.exists(manifest):
            with open(manifest) as f:
                m = json.load(f)
            if m.get("key") == key:
                return m["rows"]
        # stale params or incomplete fetch: clear non-hidden parts
        if os.path.isdir(landing_dir):
            for name in os.listdir(landing_dir):
                if not name.startswith((".", "_")):
                    os.unlink(os.path.join(landing_dir, name))
        total = 0
        for page in range(max_pages):
            body = self.transport(
                self.base_url, self._params(where, order, page * self.page_size)
            )
            if isinstance(body, dict):
                raise RuntimeError(f"SODA API error: {body.get('message', body)}")
            rows = list(body)
            if rows:
                _land_jsonl(landing_dir, rows, page)
                total += len(rows)
            if len(rows) < self.page_size:
                os.makedirs(landing_dir, exist_ok=True)
                tmp = os.path.join(landing_dir, f".tmp-{uuid.uuid4().hex}")
                with open(tmp, "w") as f:
                    json.dump({"key": key, "rows": total}, f)
                os.rename(tmp, manifest)
                return total
        raise RuntimeError(f"SODA paging did not terminate in {max_pages} pages")

    @staticmethod
    def shards(since: str, until: str) -> list[str]:
        """$where predicates splitting [since, until) by month -- the
        unit of fetch parallelism at scale (each shard is one fetcher
        task; the landing dir unions them)."""
        ys, ms = int(since[:4]), int(since[5:7])
        ye, me = int(until[:4]), int(until[5:7])
        out = []
        while (ys, ms) < (ye, me):
            ny, nm = (ys + 1, 1) if ms == 12 else (ys, ms + 1)
            out.append(
                f"crash_date >= '{ys:04d}-{ms:02d}-01' "
                f"AND crash_date < '{ny:04d}-{nm:02d}-01'"
            )
            ys, ms = ny, nm
        return out


class CartoSqlClient:
    """CARTO SQL API shim: SELECTs via GET (main.py:116-124), DML via
    POST (make_carto_sql_api_request, main.py:536-552).  The response
    envelope is ``{"rows": [...]}``."""

    def __init__(
        self,
        base_url: str,
        api_key: str | None = None,
        transport: Transport = http_json_transport,
    ) -> None:
        self.base_url = base_url
        self.api_key = api_key
        self.transport = transport

    def sql(self, query: str) -> list[dict]:
        params = {"q": query}
        if self.api_key:
            params["api_key"] = self.api_key
        body = self.transport(self.base_url, params)
        if not isinstance(body, dict) or "rows" not in body:
            raise RuntimeError(f"CARTO SQL API error: {body}")
        return body["rows"]

    def fetch_table_to_landing(
        self, landing_dir: str, table: str, where: str | None = None
    ) -> int:
        q = f"SELECT * FROM {table}"
        if where:
            q += f" WHERE {where}"
        rows = self.sql(q)
        _land_jsonl(landing_dir, rows, 0)
        return len(rows)


def read_soda(
    spark: SparkSession,
    base_url: str,
    landing_dir: str,
    where: str | None = None,
    order: str | None = None,
    app_token: str | None = None,
    transport: Transport = http_json_transport,
    page_size: int = 50_000,
    use_cache: bool = False,
) -> DataFrame:
    """S1 live path: fetch the SODA feed (pushdown params on the
    request) to ``landing_dir``, then scan it with the typed feed
    schema.  Returns the same shape as
    :func:`~.readers.read_soda_snapshot`, so every downstream operator
    is oblivious to snapshot-vs-live.  ``use_cache=True`` skips the
    HTTP round-trip when the landing dir already holds a completed
    fetch for the same params."""
    from nyc_crash_mapper_etl_script_spark.sources.readers import read_soda_snapshot

    client = SodaClient(base_url, app_token, page_size, transport)
    client.fetch_to_landing(landing_dir, where=where, order=order, use_cache=use_cache)
    return read_soda_snapshot(spark, landing_dir)


def read_carto_table(
    spark: SparkSession,
    base_url: str,
    landing_dir: str,
    table: str,
    where: str | None = None,
    api_key: str | None = None,
    transport: Transport = http_json_transport,
    schema=None,
) -> DataFrame:
    """S3 live path: SELECT a CARTO table through the SQL API into the
    landing dir, then scan.  ``where`` is the server-side pushdown
    string (the reference's date_val >= ... filter, main.py:117)."""
    client = CartoSqlClient(base_url, api_key, transport)
    client.fetch_table_to_landing(landing_dir, table, where)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(landing_dir)
