"""Custom Spark data sources (Python DataSource API, Spark 4+)."""

from .tab_datasource import TabDataSource, register_tab_source

__all__ = ["TabDataSource", "register_tab_source"]
