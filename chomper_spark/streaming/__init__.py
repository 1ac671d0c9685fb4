from chomper_spark.streaming.sources import (  # noqa: F401
    KAFKA_WIRE,
    FeedSource,
    FileFeedSource,
    KafkaFeedSource,
    KafkaWireReplaySource,
)
from chomper_spark.streaming.stream import StreamingApply  # noqa: F401
from chomper_spark.streaming.dedup_stream import StreamingNearDup  # noqa: F401
