from .text import (  # noqa: F401
    LangId,
    fingerprint_md5,
    quality_score,
    rolling_fingerprint,
    token_count,
)
from .dedup import (  # noqa: F401
    MinHasher,
    SimHasher,
    connected_components,
    exact_dedup,
    lsh_candidates,
    minhash_dedup,
    simhash_near_dups,
)
from .jpeg import decode_jpeg, encode_jpeg  # noqa: F401
from .video import (  # noqa: F401
    VideoFrameSample,
    decode_avi_frames,
    encode_avi_mjpeg,
)
from .dedup_index import (  # noqa: F401
    append_to_index,
    build_minhash_index,
    dedup_against_index,
)
from .ann import assign_cells, brute_force_topk, ivf_topk, lsh_topk, train_ivf_centroids  # noqa: F401
from .pack import deterministic_shuffle, global_index, pack_sequences  # noqa: F401
from .sample import rate_sample, stratified_sample, upsample  # noqa: F401
from .text import repetition_stats, scrub_regex  # noqa: F401
from .sketch import CountMinSketch, HyperLogLog, approx_distinct, build_cms, heavy_hitters  # noqa: F401
from .bloom import BloomFilter, bloom_anti_join, build_bloom  # noqa: F401
from .relevance import (  # noqa: F401
    append_to_text_index,
    bm25_search_index,
    bm25_topk,
    build_text_index,
    doc_terms,
    term_df,
    tfidf_topk_terms,
)
from .agg import (  # noqa: F401
    cube_agg,
    grouped_corr,
    grouped_quantiles,
    grouped_stats,
    histogram,
    grouped_topn,
    pivot_counts,
    rolling_agg,
    rollup_agg,
    running_agg,
    window_nav,
    window_ranks,
)
from .fuzzy import fuzzy_pairs, levenshtein  # noqa: F401
from .profile import profile_table  # noqa: F401
from .setops import except_distinct, intersect_distinct, set_compare  # noqa: F401
