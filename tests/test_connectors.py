"""Connector shim tests: SODA/CARTO fetch-to-landing against a
directory-backed fake feed server (no network), including the full
run_nightly DAG fed through the live-connector path."""

from __future__ import annotations

import pytest

from test_pipeline import (
    _crosswalk,
    _districts,
    _empty_crashes,
    _feed_rows,
    _intersections,
)

from nyc_crash_mapper_etl_script_spark.plans.nightly import run_nightly
from nyc_crash_mapper_etl_script_spark.sources.connectors import (
    CartoSqlClient,
    SodaClient,
    read_carto_table,
    read_soda,
)

SODA_URL = "https://fake.socrata.test/resource/h9gi-nx95.json"
CARTO_URL = "https://fake.carto.test/api/v2/sql"


class FakeSodaServer:
    """Directory-of-rows stand-in for the SODA endpoint: honors
    $limit/$offset paging and records every request's params so tests
    can assert the pushdown contract."""

    def __init__(self, rows, fail_with=None):
        self.rows = rows
        self.calls: list[dict] = []
        self.fail_with = fail_with

    def __call__(self, url, params):
        assert url == SODA_URL
        self.calls.append(dict(params))
        if self.fail_with is not None:
            return {"error": True, "message": self.fail_with}
        lo = int(params.get("$offset", "0"))
        hi = lo + int(params["$limit"])
        return self.rows[lo:hi]


def test_soda_paging_and_pushdown(tmp_path):
    rows = [{"collision_id": str(i)} for i in range(25)]
    server = FakeSodaServer(rows)
    client = SodaClient(SODA_URL, app_token="tok", page_size=10, transport=server)
    n = client.fetch_to_landing(
        str(tmp_path / "landing"),
        where="crash_date >= '2024-06-01'",
        order="crash_date DESC",
    )
    assert n == 25
    assert len(server.calls) == 3  # 10 + 10 + 5 (short page terminates)
    first = server.calls[0]
    # the reference's exact param contract (main.py:89-97, 834-835)
    assert first["$where"] == "crash_date >= '2024-06-01'"
    assert first["$order"] == "crash_date DESC"
    assert first["$limit"] == "10"
    assert first["$$app_token"] == "tok"
    assert first["$select"] == ":*,*"
    assert server.calls[2]["$offset"] == "20"
    landed = sorted(p.name for p in (tmp_path / "landing").iterdir()
                    if not p.name.startswith(("_", ".")))
    assert landed == ["part-00000.jsonl", "part-00001.jsonl", "part-00002.jsonl"]


def test_soda_error_envelope_raises(tmp_path):
    server = FakeSodaServer([], fail_with="rate limited")
    client = SodaClient(SODA_URL, transport=server)
    with pytest.raises(RuntimeError, match="rate limited"):
        client.fetch_to_landing(str(tmp_path / "landing"))


def test_soda_month_shards():
    shards = SodaClient.shards("2024-05-01", "2024-08-01")
    assert len(shards) == 3
    assert shards[0] == (
        "crash_date >= '2024-05-01' AND crash_date < '2024-06-01'"
    )
    assert shards[-1].startswith("crash_date >= '2024-07-01'")


def test_carto_select_lands_rows(spark, tmp_path):
    def server(url, params):
        assert url == CARTO_URL
        assert params["q"] == (
            "SELECT * FROM crashes_table WHERE date_val >= '2024-06-01T00:00:00Z'"
        )
        assert params["api_key"] == "key"
        return {"rows": [{"socrata_id": 1}, {"socrata_id": 2}]}

    df = read_carto_table(
        spark,
        CARTO_URL,
        str(tmp_path / "carto"),
        "crashes_table",
        where="date_val >= '2024-06-01T00:00:00Z'",
        api_key="key",
        transport=server,
    )
    assert sorted(r["socrata_id"] for r in df.collect()) == [1, 2]


def test_carto_dml_error_envelope():
    client = CartoSqlClient(CARTO_URL, transport=lambda u, p: {"error": ["nope"]})
    with pytest.raises(RuntimeError, match="CARTO SQL API error"):
        client.sql("SELECT 1")


def test_read_soda_feeds_run_nightly(spark, tmp_path):
    """End-to-end through the live-connector path: fake feed server ->
    paged landing -> typed scan -> full nightly DAG.  Results match
    the snapshot-path pipeline test expectations."""
    server = FakeSodaServer(_feed_rows())
    feed = read_soda(
        spark,
        SODA_URL,
        str(tmp_path / "landing"),
        where="crash_date >= '2024-05-01'",
        order="crash_date DESC",
        transport=server,
        page_size=3,  # force multi-page landing
    )
    assert len(server.calls) == 2
    out = run_nightly(
        feed,
        _empty_crashes(spark),
        _districts(spark),
        _intersections(spark),
        _crosswalk(spark),
        reference_date="2024-07-01",
    )
    crashes = {r["socrata_id"]: r for r in out["crashes"].collect()}
    assert set(crashes) == {101, 102, 103, 104}
    assert crashes[101]["borough"] == "Brooklyn"
    assert crashes[103]["the_geom"] is None  # outside extent, nulled
    assert crashes[103]["longitude"] == 99.0  # raw coords survive


def test_soda_landing_cache(tmp_path):
    """Same (where, order, page_size): second fetch serves from the
    landing dir with zero HTTP calls; changed params refetch."""
    rows = [{"collision_id": str(i)} for i in range(7)]
    server = FakeSodaServer(rows)
    client = SodaClient(SODA_URL, page_size=10, transport=server)
    d = str(tmp_path / "landing")
    assert client.fetch_to_landing(d, where="w1", use_cache=True) == 7
    calls_after_first = len(server.calls)
    assert client.fetch_to_landing(d, where="w1", use_cache=True) == 7
    assert len(server.calls) == calls_after_first  # served from cache
    assert client.fetch_to_landing(d, where="w2", use_cache=True) == 7
    assert len(server.calls) > calls_after_first  # param change refetches
    # cache off: always refetches
    client.fetch_to_landing(d, where="w2", use_cache=False)
    assert len(server.calls) > calls_after_first + 1


def test_read_jdbc_option_passthrough():
    """The JDBC reader wiring, pinned without a driver: every knob
    lands on the DataFrameReader exactly as the integration recipe
    documents (url/dbtable, partitioned-read bounds, passthrough
    options like user/driver/fetchsize)."""
    from nyc_crash_mapper_etl_script_spark.sources.readers import read_jdbc

    class _RecordingReader:
        def __init__(self):
            self.fmt = None
            self.opts = {}
            self.loaded = False

        def format(self, f):
            self.fmt = f
            return self

        def option(self, k, v):
            self.opts[k] = v
            return self

        def load(self):
            self.loaded = True
            return "LOADED"

    class _FakeSpark:
        def __init__(self, rec):
            self._rec = rec

        @property
        def read(self):
            return self._rec

    rec = _RecordingReader()
    out = read_jdbc(
        _FakeSpark(rec),
        "jdbc:mysql://host:3306/walkmapper",
        "obstructionDetails",
        partition_column="id",
        num_partitions=16,
        lower_bound=5,
        upper_bound=99,
        user="u",
        password="p",
        driver="com.mysql.cj.jdbc.Driver",
        fetchsize="10000",
    )
    assert out == "LOADED" and rec.loaded and rec.fmt == "jdbc"
    assert rec.opts == {
        "url": "jdbc:mysql://host:3306/walkmapper",
        "dbtable": "obstructionDetails",
        "partitionColumn": "id",
        "numPartitions": "16",
        "lowerBound": "5",
        "upperBound": "99",
        "user": "u",
        "password": "p",
        "driver": "com.mysql.cj.jdbc.Driver",
        "fetchsize": "10000",
    }

    # unpartitioned: no bound options leak in
    rec2 = _RecordingReader()
    read_jdbc(_FakeSpark(rec2), "jdbc:mysql://h/db", "t")
    assert rec2.opts == {"url": "jdbc:mysql://h/db", "dbtable": "t"}


def test_read_jdbc_live_embedded_derby(spark, tmp_path):
    """S4 LIVE: the real JDBC code path against an embedded Apache
    Derby database (the one JDBC engine whose driver ships inside
    Spark's own jars) -- no parquet stand-in.  Proves the plain scan,
    the partitioned parallel extract (partition_column bounds -> one
    JDBC query per stride), and server-side pushdown via a derived
    subquery as dbtable, exactly the recipe read_jdbc's docstring
    gives for MySQL (walkmapper/mysql2carto.py:63,114-137)."""
    from nyc_crash_mapper_etl_script_spark.sources.readers import read_jdbc

    db = str(tmp_path / "derbydb")
    url = f"jdbc:derby:{db}"
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url + ";create=true")
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE obstructions (id INT PRIMARY KEY, "
        "category VARCHAR(40), severity INT)"
    )
    for i in range(20):
        st.executeUpdate(
            f"INSERT INTO obstructions VALUES ({i}, 'cat{i % 3}', {i * 10})"
        )
    st.close()
    conn.close()

    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    # plain scan
    df = read_jdbc(spark, url, "obstructions", driver=driver)
    assert df.count() == 20
    assert {r["CATEGORY"] for r in df.collect()} == {"cat0", "cat1", "cat2"}

    # partitioned parallel extract: same rows, multiple strides
    part = read_jdbc(
        spark,
        url,
        "obstructions",
        partition_column="ID",
        lower_bound=0,
        upper_bound=20,
        num_partitions=4,
        driver=driver,
    )
    assert part.rdd.getNumPartitions() == 4
    assert sorted(r["ID"] for r in part.collect()) == list(range(20))

    # pushdown: the predicate runs inside Derby via a derived table
    sub = read_jdbc(
        spark,
        url,
        "(SELECT id, severity FROM obstructions WHERE severity >= 100) AS src",
        driver=driver,
    )
    assert sorted(r["ID"] for r in sub.collect()) == list(range(10, 20))

    # Catalyst filter pushdown reaches the JDBC source (PushedFilters)
    plan = (
        df.where(df["severity"] > 150)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "SEVERITY" in plan


def test_read_soda_snapshot_audited_quarantines_bad_lines(spark, tmp_path):
    """S1 robustness: malformed feed lines land in _corrupt_record
    (raw text preserved) instead of killing the scan or vanishing;
    clean rows parse normally and flow into the pipeline."""
    from nyc_crash_mapper_etl_script_spark.sources.readers import (
        read_soda_snapshot_audited,
    )

    feed = tmp_path / "feed.jsonl"
    feed.write_text(
        '{"collision_id": "1", "crash_date": "2024-06-01T00:00:00.000"}\n'
        "{this is not json at all\n"
        '{"collision_id": "2", "crash_date": "2024-06-02T00:00:00.000"}\n'
    )
    # cache() is Spark's documented workaround for the
    # only-corrupt-column query restriction the helper notes
    df = read_soda_snapshot_audited(spark, str(feed)).cache()
    rows = df.select("collision_id", "_corrupt_record").collect()
    good = {r["collision_id"] for r in rows if r["_corrupt_record"] is None}
    bad = [r["_corrupt_record"] for r in rows if r["_corrupt_record"] is not None]
    assert good == {"1", "2"}
    assert bad == ["{this is not json at all"]
    # the clean split feeds the normal pipeline
    clean = df.where(df["_corrupt_record"].isNull()).drop("_corrupt_record")
    assert clean.count() == 2
    df.unpersist()
