"""SQL source/sink parity (reference combine_csv.py:506-550, utils.py:17-151).

Executable paths run against any DBAPI2 connection factory — exercised end
to end with the stdlib ``sqlite3`` (the reference used sqlalchemy URIs; the
container ships no sqlalchemy/server drivers, so ``sqlite:///`` URIs are
handled natively and other URIs stay gated behind an import-try). The pure
part — DDL generation from the unified schema (the reference's
``return_create_sql`` mode, combine_csv.py:539-545) — is dialect-aware.
"""

from __future__ import annotations

import pyarrow as pa

_PG_TYPES = {
    "int8": "SMALLINT", "int16": "SMALLINT", "int32": "INTEGER",
    "int64": "BIGINT", "uint8": "SMALLINT", "uint16": "INTEGER",
    "uint32": "BIGINT", "uint64": "NUMERIC(20)",
    "float": "REAL", "double": "DOUBLE PRECISION",
    "bool": "BOOLEAN", "string": "TEXT", "large_string": "TEXT",
    "binary": "BYTEA", "large_binary": "BYTEA",
    "date32[day]": "DATE",
}

_MYSQL_TYPES = {**_PG_TYPES, "binary": "BLOB", "large_binary": "BLOB",
                "double": "DOUBLE", "string": "TEXT"}


_SQLITE_TYPES = {
    "int8": "INTEGER", "int16": "INTEGER", "int32": "INTEGER",
    "int64": "INTEGER", "uint8": "INTEGER", "uint16": "INTEGER",
    "uint32": "INTEGER", "uint64": "INTEGER",
    "float": "REAL", "double": "REAL", "bool": "INTEGER",
    "string": "TEXT", "large_string": "TEXT",
    "binary": "BLOB", "large_binary": "BLOB", "date32[day]": "TEXT",
}


def _sql_type(t: pa.DataType, dialect: str) -> str:
    table = {"mysql": _MYSQL_TYPES,
             "sqlite": _SQLITE_TYPES}.get(dialect, _PG_TYPES)
    if pa.types.is_timestamp(t):
        return {"mysql": "DATETIME", "sqlite": "TEXT"}.get(dialect,
                                                           "TIMESTAMP")
    if pa.types.is_decimal(t):
        return f"NUMERIC({t.precision},{t.scale})"
    return table.get(str(t), "TEXT")


def schema_to_ddl(schema: pa.Schema, table_name: str,
                  schema_name: str | None = None,
                  dialect: str = "postgres") -> str:
    """CREATE TABLE DDL for the unified schema (reference
    ``to_sql_combine(..., return_create_sql=True)`` semantics)."""
    qual = f"{schema_name}.{table_name}" if schema_name else table_name
    cols = ",\n  ".join(f'"{f.name}" {_sql_type(f.type, dialect)}'
                        for f in schema)
    return f"CREATE TABLE {qual} (\n  {cols}\n);"


def _connection_factory(uri: str):
    """DBAPI2 connection factory from a URI. ``sqlite:///path`` is handled
    natively with the stdlib; anything else needs sqlalchemy (gated)."""
    if uri.startswith("sqlite://"):
        import sqlite3
        path = uri.split("sqlite://", 1)[1].lstrip("/")
        path = "/" + path if uri.startswith("sqlite:////") else path
        return lambda: sqlite3.connect(path or ":memory:", timeout=30)
    try:  # pragma: no cover - environment-dependent
        import sqlalchemy as sa
    except ImportError as e:
        raise ImportError(
            "non-sqlite SQL paths need sqlalchemy + a DB driver; neither is "
            "installed in this environment. Use a sqlite:/// URI, "
            "schema_to_ddl() for DDL, or the parquet/CSV sinks.") from e
    engine = sa.create_engine(uri)  # pragma: no cover
    return engine.raw_connection  # pragma: no cover


def read_sql_query(sql: str, uri: str, **read_kwargs):
    """SQL query → Dataset (reference pd_readsql_query_from_sqlengine,
    utils.py:17-40) via ``ray.data.read_sql`` over a DBAPI2 factory."""
    import ray.data
    return ray.data.read_sql(sql, _connection_factory(uri), **read_kwargs)


def read_sql_table(table_name: str, uri: str, **read_kwargs):
    """Whole table → Dataset (reference pd_readsql_table_from_sqlengine,
    utils.py:43-65)."""
    return read_sql_query(f"SELECT * FROM {table_name}", uri, **read_kwargs)


def pd_to_sql(df, uri: str, table_name: str, if_exists: str = "fail") -> str:
    """Standalone DataFrame → DB bulk loader (reference pd_to_psql /
    pd_to_mysql, utils.py:69-151: create table from the frame's schema,
    then one bulk insert). sqlite:/// executes natively; server dialects
    need their drivers."""
    import pyarrow as pa
    factory = _connection_factory(uri)
    schema = pa.Schema.from_pandas(df, preserve_index=False)
    dialect = "sqlite" if uri.startswith("sqlite://") else "postgres"
    conn = factory()
    try:
        cur = conn.cursor()
        if if_exists == "replace":
            cur.execute(f"DROP TABLE IF EXISTS {table_name}")
        ddl = schema_to_ddl(schema, table_name, dialect=dialect)
        if if_exists == "append":
            ddl = ddl.replace("CREATE TABLE", "CREATE TABLE IF NOT EXISTS", 1)
        cur.execute(ddl.rstrip(";\n "))
        cur.executemany(
            f"INSERT INTO {table_name} VALUES "
            f"({', '.join(['?'] * len(df.columns))})",
            [tuple(None if v != v else v for v in row) if any(
                isinstance(v, float) for v in row) else tuple(row)
             for row in df.itertuples(index=False, name=None)])
        conn.commit()
    finally:
        conn.close()
    return table_name


def write_sql_combine(ds, uri: str, table_name: str,
                      if_exists: str = "fail") -> str:
    """Aligned Dataset → SQL table: create the table from the unified
    schema (the reference created it from the empty preview frame,
    combine_csv.py:534-537), then append every block via ``ds.write_sql``
    (distributed INSERT batches — the reference's per-chunk ``to_sql``)."""
    factory = _connection_factory(uri)
    schema = ds.schema()
    dialect = "sqlite" if uri.startswith("sqlite://") else "postgres"
    conn = factory()
    try:
        cur = conn.cursor()
        if if_exists == "replace":
            cur.execute(f"DROP TABLE IF EXISTS {table_name}")
        elif if_exists == "fail":
            pass  # CREATE TABLE below raises if it exists
        ddl = schema_to_ddl(
            pa.schema([pa.field(n, t) for n, t in
                       zip(schema.names, schema.types)]),
            table_name, dialect=dialect)
        if if_exists == "append":
            ddl = ddl.replace("CREATE TABLE", "CREATE TABLE IF NOT EXISTS", 1)
        cur.execute(ddl.rstrip(";\n "))
        conn.commit()
    finally:
        conn.close()
    ds.write_sql(
        f"INSERT INTO {table_name} VALUES "
        f"({', '.join(['?'] * len(schema.names))})", factory)
    return table_name
