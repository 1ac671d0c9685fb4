from chomper_spark.streaming.sources import (  # noqa: F401
    FeedSource,
    FileFeedSource,
    KafkaFeedSource,
)
from chomper_spark.streaming.stream import StreamingApply  # noqa: F401
