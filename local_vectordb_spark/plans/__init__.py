from local_vectordb_spark.plans.quality import (  # noqa: F401
    broadcast_build_scans,
    broadcast_join_count,
    count_shuffles,
    plan_string,
    pushed_filters,
    read_schema_columns,
    sort_merge_join_count,
    unreduced_fact_broadcasts,
)
