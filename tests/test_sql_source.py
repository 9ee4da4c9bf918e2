"""Executing SQL source/sink tests over stdlib sqlite3 (the reference's
S4/K6 paths, combine_csv.py:506-550 + utils.py:17-65, exercised end-to-end
without sqlalchemy)."""

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def test_ddl_sqlite_dialect():
    import pyarrow as pa
    from raystack.sources.sql import schema_to_ddl
    ddl = schema_to_ddl(pa.schema([("a", pa.int64()), ("b", pa.string()),
                                   ("c", pa.float64())]),
                        "t", dialect="sqlite")
    assert '"a" INTEGER' in ddl and '"b" TEXT' in ddl and '"c" REAL' in ddl


def test_sqlite_write_read_roundtrip(ray_session, tmp_path):
    import ray.data
    from raystack.sources.sql import read_sql_table, write_sql_combine
    uri = f"sqlite:///{tmp_path}/t.db"
    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text", "lang", "n_chars"])
    write_sql_combine(ds, uri, "docs", if_exists="replace")
    back = read_sql_table("docs", uri).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    exp = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "text", "lang", "n_chars"]) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(back) == len(exp)
    assert back["text"].equals(exp["text"])
    assert back["n_chars"].equals(exp["n_chars"])


def test_sqlite_if_exists_modes(ray_session, tmp_path):
    import ray.data
    from raystack.sources.sql import read_sql_query, write_sql_combine
    uri = f"sqlite:///{tmp_path}/m.db"
    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "lang"]).limit(50)
    write_sql_combine(ds, uri, "d", if_exists="replace")
    with pytest.raises(Exception):  # table exists
        write_sql_combine(ds, uri, "d", if_exists="fail")
    write_sql_combine(ds, uri, "d", if_exists="append")
    n = read_sql_query("SELECT count(*) AS n FROM d", uri).to_pandas()
    assert int(n["n"][0]) == 100


def test_stacker_sql_sink(ray_session, tmp_path):
    """The reference's to_sql_combine flow through the Stacker facade."""
    import numpy as np
    import pyarrow as pa
    from raystack.sources.sql import read_sql_query
    from raystack.stacker import Stacker
    paths = []
    for i in range(2):
        t = pa.table({"a": np.arange(5) + i * 5,
                      "b": [f"r{i}{j}" for j in range(5)]})
        p = str(tmp_path / f"in{i}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    st = Stacker(paths, add_filename=False)
    ddl = st.to_sql_combine(table_name="stacked", return_create_sql=True)
    assert "CREATE TABLE" in ddl
    uri = f"sqlite:///{tmp_path}/s.db"
    st.to_sql_combine(uri=uri, table_name="stacked")
    back = read_sql_query("SELECT * FROM stacked ORDER BY a", uri).to_pandas()
    assert back["a"].tolist() == list(range(10))


def test_pd_to_sql_bulk_loader(tmp_path):
    """K11-family parity: standalone DataFrame bulk load (reference
    pd_to_psql semantics on the sqlite backend)."""
    from raystack.sources.sql import pd_to_sql, _connection_factory
    uri = f"sqlite:///{tmp_path}/bulk.db"
    df = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", None],
                       "c": [1.5, float("nan"), 3.0]})
    pd_to_sql(df, uri, "t", if_exists="replace")
    conn = _connection_factory(uri)()
    rows = conn.execute("SELECT * FROM t ORDER BY a").fetchall()
    conn.close()
    assert rows[0] == (1, "x", 1.5)
    assert rows[1][1] == "y" and rows[1][2] is None  # NaN -> NULL
    assert rows[2] == (3, None, 3.0)


class _FakeCursor:
    """DBAPI2 cursor recording statements + COPY payloads (stands in for
    psycopg2/mysql/pymssql cursors absent from this container)."""

    def __init__(self, log):
        self.log = log

    def execute(self, sql, *a):
        self.log.append(("execute", sql))

    def copy_expert(self, sql, buf):
        self.log.append(("copy", sql, buf.read()))


class _FakeConn:
    def __init__(self, log):
        self.log = log

    def cursor(self):
        return _FakeCursor(self.log)

    def commit(self):
        self.log.append(("commit",))

    def close(self):
        self.log.append(("close",))


def test_pd_to_psql_native_copy(tmp_path):
    # reference utils.py:69-112: header-less CSV buffer, null='', COPY,
    # table created from the frame's schema honoring if_exists
    from raystack.sources.sql import pd_to_psql
    df = pd.DataFrame({"a": [1, 2], "b": ["x", None]})
    log = []
    assert pd_to_psql(df, "postgresql+psycopg2://u:p@h/db", "T",
                      if_exists="replace", _factory=lambda: _FakeConn(log))
    kinds = [e[0] for e in log]
    assert kinds == ["execute", "execute", "copy", "commit", "close"]
    assert log[0][1] == "DROP TABLE IF EXISTS t"        # lower-cased name
    assert log[1][1].startswith("CREATE TABLE t")
    copy_sql, payload = log[2][1], log[2][2]
    assert copy_sql == ("COPY t FROM STDIN WITH "
                        "(FORMAT csv, DELIMITER ',', NULL '')")
    assert payload == "1,x\n2,\n"                        # no header, '' null


def test_pd_to_mysql_load_data(tmp_path):
    from raystack.sources.sql import pd_to_mysql
    df = pd.DataFrame({"a": [1, 2], "b": ["x", None]})
    log = []
    tmpfile = str(tmp_path / "stage.csv")
    staged = {}

    class SnoopCursor(_FakeCursor):
        def execute(self, sql, *a):
            if sql.startswith("LOAD DATA"):
                staged["csv"] = open(tmpfile).read()
            super().execute(sql, *a)

    class SnoopConn(_FakeConn):
        def cursor(self):
            return SnoopCursor(self.log)

    assert pd_to_mysql(df, "mysql+mysqlconnector://u:p@h/db", "T",
                       if_exists="append", tmpfile=tmpfile,
                       _factory=lambda: SnoopConn(log))
    create, load = log[0][1], log[1][1]
    assert create.startswith("CREATE TABLE IF NOT EXISTS t")
    assert load == (f"LOAD DATA LOCAL INFILE '{tmpfile}' INTO TABLE t "
                    "FIELDS TERMINATED BY ',' LINES TERMINATED BY '\n' "
                    "IGNORE 1 LINES;")
    assert staged["csv"] == "a,b\n1,x\n2,\\N\n"          # header + \N nulls
    assert not os.path.exists(tmpfile)                   # cleaned up


def test_pd_to_mssql_bulk_insert(tmp_path):
    from raystack.sources.sql import pd_to_mssql
    df = pd.DataFrame({"a": [1]})
    log = []
    tmpfile = str(tmp_path / "stage.csv")
    assert pd_to_mssql(df, "mssql+pymssql://u:p@h/db", "T",
                       schema_name="DBO", tmpfile=tmpfile,
                       _factory=lambda: _FakeConn(log))
    assert log[0][1].startswith("CREATE TABLE dbo.t")
    assert log[1][1] == f"BULK INSERT dbo.t FROM '{tmpfile}';"


def test_pd_to_loaders_uri_validation():
    from raystack.sources.sql import pd_to_mysql, pd_to_psql
    df = pd.DataFrame({"a": [1]})
    with pytest.raises(ValueError, match="psycopg2"):
        pd_to_psql(df, "postgresql://u:p@h/db", "t")
    with pytest.raises(ValueError, match="mysqlconnector"):
        pd_to_mysql(df, "mysql://u:p@h/db", "t")
