from chomper_spark.streaming.stream import StreamingApply  # noqa: F401
