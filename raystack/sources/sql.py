"""SQL sink parity (reference combine_csv.py:506-550, utils.py:69-151).

The container ships no database drivers or sqlalchemy, so the executable
paths are gated behind import-try; the pure parts — DDL generation from the
unified schema (the reference's ``return_create_sql`` mode,
combine_csv.py:539-545) — are implemented and tested.
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


def _sql_type(t: pa.DataType, dialect: str) -> str:
    table = _MYSQL_TYPES if dialect == "mysql" else _PG_TYPES
    if pa.types.is_timestamp(t):
        return "TIMESTAMP" if dialect != "mysql" else "DATETIME"
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


def write_sql_combine(ds, uri: str, table_name: str,
                      if_exists: str = "fail") -> None:
    """Aligned Dataset → SQL table via ``ds.write_sql`` (needs a DB driver;
    gated — this container has none)."""
    try:
        import sqlalchemy  # noqa: F401
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise ImportError(
            "write_sql_combine needs sqlalchemy + a DB driver; neither is "
            "installed in this environment. Use schema_to_ddl() for DDL and "
            "write_parquet/write_csv sinks instead.") from e
    import sqlalchemy as sa

    engine = sa.create_engine(uri)

    def create_conn():
        return engine.raw_connection()

    ds.write_sql(f"INSERT INTO {table_name} VALUES "
                 f"({', '.join(['?'] * len(ds.schema().names))})",
                 create_conn)  # pragma: no cover
