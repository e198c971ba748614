"""Query library. Importing this package registers every query/oracle
pair into ``etl_xlsx_potgres_spark.registry``."""

from . import (  # noqa: F401
    analytics,
    chunking,
    curation,
    dedup_fuzzy,
    functions_pack,
    graph_components,
    graph_iterative,
    multimodal,
    pandas_udfs,
    profiling,
    reference_pipeline,
    reference_surface,
    relational,
    relational_extra,
    similarity,
    streaming_queries,
    text_analysis,
    timeseries,
    tpch_adapted,
    tpch_more,
    training_data,
    udaf_pandas,
    windows_aggs,
    xlsx_pipeline,
)
