from .jdbc import (
    JdbcTarget,
    append,
    build_insert_sql,
    build_upsert_sql,
    upsert_insert_if_absent,
)
from .partitioned import write_partitioned
from .quarantine import write_quarantine

__all__ = [
    "JdbcTarget",
    "append",
    "build_insert_sql",
    "build_upsert_sql",
    "upsert_insert_if_absent",
    "write_quarantine",
]
