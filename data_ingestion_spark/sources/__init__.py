from .catalog import TABLES, load_table, load_all, product_dim, lang_dim

__all__ = ["TABLES", "load_table", "load_all", "product_dim", "lang_dim"]
