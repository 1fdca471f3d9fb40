"""Operator inventory (SURVEY.md §2). Importing this package registers every
query into ksql_spark.registry via the @query decorator."""

from ksql_spark.queries import (  # noqa: F401
    aggregates,
    bench,
    curation,
    estimation,
    filters,
    functions,
    graph,
    joins,
    k8s_queries,
    llm,
    pipeline_audit,
    setops,
    sorts,
    streaming_batch,
    text_pipeline,
    tpch,
    udfs,
    wave12,
    wave13,
    windows,
)
