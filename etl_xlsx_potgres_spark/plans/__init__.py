"""Query library. Importing this package registers every query/oracle
pair into ``etl_xlsx_potgres_spark.registry``."""

from . import reference_surface, relational  # noqa: F401
