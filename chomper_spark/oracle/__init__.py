from chomper_spark.oracle.reference_apply import reference_apply  # noqa: F401
