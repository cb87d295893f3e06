"""Scalar column-expression library (all JVM-side built-ins, no Python UDFs).

Reproduces the reference's scalar surface — time extraction/binning
(util/TimeUtil.kt, path/RecordPathFactory.kt), ID sanitize + path templating
(path/FormattedPathFactory.kt), filename parsing
(accounting/TopicPartitionOffsetRange.kt) — plus the text-analysis and
vector-math functions the north-star extensions need.
"""

from restructure_hdfs_topic_spark.functions.time import (  # noqa: F401
    event_time,
    time_bin,
)
from restructure_hdfs_topic_spark.functions.paths import (  # noqa: F401
    parse_source_filename,
    render_path,
    sanitize_id,
)
