from .tables import SCHEMAS, TABLE_NAMES, load_table, load_tables, register_views

__all__ = ["SCHEMAS", "TABLE_NAMES", "load_table", "load_tables", "register_views"]
