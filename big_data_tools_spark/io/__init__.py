from .deltaread import read_delta
from .icebergread import read_iceberg
from .schemas import TABLE_NAMES, TABLE_SCHEMAS
from .sources import load_table, load_tables, read_json

__all__ = [
    "TABLE_NAMES",
    "TABLE_SCHEMAS",
    "load_table",
    "load_tables",
    "read_delta",
    "read_iceberg",
    "read_json",
]
