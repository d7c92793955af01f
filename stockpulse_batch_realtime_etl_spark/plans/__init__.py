from stockpulse_batch_realtime_etl_spark.plans.assertions import (  # noqa: F401
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filter,
    assert_take_ordered,
    assert_whole_stage_codegen,
    count_exchanges,
    formatted_plan,
    read_schema_columns,
)
