from .tables import TABLE_NAMES, load_tables, register_views, table

__all__ = ["TABLE_NAMES", "table", "load_tables", "register_views"]
