from crawlee_spark.sources.request_list import (  # noqa: F401
    RequestList,
    requests_from_manifest,
    requests_from_url_text,
)
