from crawlee_spark.streaming.stream_crawl import (  # noqa: F401
    StreamingCrawl,
    streaming_url_seen,
    windowed_fetch_rate,
)
from crawlee_spark.streaming.stream_dedup import StreamingDedup  # noqa: F401
from crawlee_spark.streaming.stream_cdx import StreamingCdxIngest  # noqa: F401
from crawlee_spark.streaming.stream_curate import StreamingCurate  # noqa: F401
