"""Query library. Importing this package registers every query/oracle
pair into ``etl_xlsx_potgres_spark.registry``."""

from . import functions_pack, reference_surface, relational, windows_aggs  # noqa: F401
