from crawlee_spark.streaming.stream_crawl import (  # noqa: F401
    StreamingCrawl,
    windowed_fetch_rate,
)
