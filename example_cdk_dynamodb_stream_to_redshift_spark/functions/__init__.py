from .dynamo import (  # noqa: F401
    epoch_ms_to_timestamp,
    strip_prefix,
    av_string,
    av_number,
)
