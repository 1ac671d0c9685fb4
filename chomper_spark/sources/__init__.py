from chomper_spark.sources.feed import (  # noqa: F401
    change_feed_from_events,
    synthetic_change_feed,
    with_batch_id,
)
from chomper_spark.sources.feeders import (  # noqa: F401
    csv_feeder,
    json_feeder,
    jsonlines_feeder,
    list_feeder,
    query_feeder,
    table_feeder,
)
