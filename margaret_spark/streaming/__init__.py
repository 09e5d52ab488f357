from margaret_spark.streaming.live import (
    LiveTail,
    stream_changes,
    stream_build_index,
)
from margaret_spark.streaming.sinks import (
    compact_sink,
    read_sink_manifest,
)
from margaret_spark.streaming.stateful import (
    latest_index_reduce,
    read_keeper_sink,
    read_latest_index_sink,
    stream_asof_join,
    stream_dedup_exact,
    stream_dedup_minhash,
    stream_dedup_window,
    stream_latest_index,
    stream_token_budget,
    stream_topk,
)
from margaret_spark.streaming.contamination import (
    stream_decontaminate,
    stream_decontaminate_spans,
    stream_semantic_decontaminate,
)
from margaret_spark.streaming.cms import (
    bloom_reduce,
    cms_reduce,
    histogram_reduce,
    hll_reduce,
    read_bloom,
    read_cms,
    read_histogram,
    read_hll,
    stream_bloom,
    stream_cms,
    stream_histogram,
    read_kmv,
    stream_hll,
    stream_kmv,
)
from margaret_spark.streaming.scd import prune_history, read_history, stream_scd2
from margaret_spark.streaming.packing import stream_pack_bfd
from margaret_spark.streaming.annintake import (
    stream_hash_embed,
    stream_hier_assign,
    stream_ivf_assign,
    stream_pq_assign,
)
from margaret_spark.streaming.mediaintake import stream_image_phash
from margaret_spark.streaming.quality import (
    stream_dsir_filter,
    stream_gopher_filter,
    stream_lm_filter,
    stream_nb_filter,
)
from margaret_spark.streaming.scrub import scrub_expr, stream_scrub_pii
from margaret_spark.streaming.webfilter import stream_web_filter
from margaret_spark.streaming.windows import session_windows, windowed_agg

__all__ = [
    "LiveTail",
    "stream_changes",
    "stream_build_index",
    "stream_latest_index",
    "stream_asof_join",
    "stream_dedup_exact",
    "stream_dedup_minhash",
    "stream_dedup_window",
    "stream_token_budget",
    "stream_topk",
    "read_keeper_sink",
    "read_latest_index_sink",
    "compact_sink",
    "read_sink_manifest",
    "latest_index_reduce",
    "cms_reduce",
    "bloom_reduce",
    "hll_reduce",
    "histogram_reduce",
    "stream_scrub_pii",
    "stream_web_filter",
    "stream_gopher_filter",
    "stream_lm_filter",
    "stream_nb_filter",
    "stream_dsir_filter",
    "stream_hash_embed",
    "stream_pack_bfd",
    "stream_image_phash",
    "stream_hier_assign",
    "stream_ivf_assign",
    "stream_pq_assign",
    "stream_cms",
    "read_cms",
    "stream_bloom",
    "read_bloom",
    "read_kmv",
    "stream_hll",
    "stream_kmv",
    "read_hll",
    "stream_histogram",
    "read_histogram",
    "stream_decontaminate",
    "stream_decontaminate_spans",
    "stream_semantic_decontaminate",
    "stream_scd2",
    "read_history",
    "prune_history",
    "scrub_expr",
    "session_windows",
    "windowed_agg",
]
