"""Structured Streaming surface.

The reference has NO streaming operators (SURVEY.md §2.6) — its Arrow
"stream" is a pull-based batch iterator within one query. This module is
engine-added capability for continuous training-data pipelines: the same
event-table rollup/sessionization semantics as the batch catalog
queries, expressed over `readStream` with watermarks, so late data and
unbounded input are handled by Spark's state store instead of a rerun.
"""

from .pipeline import (
    hourly_rollup,
    read_events_stream,
    run_stream_to_memory,
    sessionize,
    view_click_attribution,
)
from .dedup import (
    MinHashIndex,
    build_minhash_index,
    extend_minhash_index,
    neardup_screen_stream,
)
from .quality import (
    UnigramLM,
    build_unigram_lm,
    perplexity_scores,
    quality_filter_stream,
)
from .monitor import quality_monitor

__all__ = [
    "read_events_stream",
    "hourly_rollup",
    "sessionize",
    "view_click_attribution",
    "run_stream_to_memory",
    "UnigramLM",
    "build_unigram_lm",
    "perplexity_scores",
    "quality_filter_stream",
    "MinHashIndex",
    "build_minhash_index",
    "extend_minhash_index",
    "neardup_screen_stream",
    "quality_monitor",
]
