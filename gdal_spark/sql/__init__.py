"""OGR SQL dialect surface."""

from .ogr_dialect import ogr_sql, register_layer

__all__ = ["ogr_sql", "register_layer"]
