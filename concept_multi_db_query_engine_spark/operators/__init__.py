"""Extended operators beyond the reference's query surface — the
LLM-training-data-pipeline toolkit (dedup, similarity search, text analysis,
multimodal plumbing, analytic windows).

The reference's surface is a closed query DSL (SURVEY.md §2.14: no UDFs); the
driver's north star adds these as first-class PySpark-native operators. All
hot paths use built-in JVM-side expressions; Python appears only inside
Arrow-batched ``mapInPandas`` for the multimodal stubs.
"""

from .analytics import (
    asof_join,
    cohort_retention,
    events_hourly,
    order_value_quantiles,
    signup_purchase_funnel,
    props_rollup,
    purchases_with_last_view,
    sessionize,
    top_orders_per_priority,
    tpch_q1,
    tpch_q3,
    tpch_q4,
    tpch_q5,
    tpch_q6,
    tpch_q12,
)
from .tpch_ext import (
    tpch_q7,
    tpch_q8,
    tpch_q9,
    tpch_q10,
    tpch_q13,
    tpch_q14,
    tpch_q15,
    tpch_q16,
    tpch_q17,
    tpch_q18,
    tpch_q19,
    tpch_q22,
)
from .dedup import (
    duplicate_clusters,
    embedding_cosine_pairs,
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_near_pairs,
)
from .similarity import (
    topk_cosine_bruteforce,
    topk_cosine_ivf,
    topk_cosine_lsh,
)
from .text import (
    bpe_token_stats,
    clean_corpus,
    pack_sequences,
    stratified_sample,
    document_fingerprint,
    language_id,
    quality_score,
    token_stats,
)

__all__ = [
    "asof_join",
    "bpe_token_stats",
    "clean_corpus",
    "cohort_retention",
    "document_fingerprint",
    "duplicate_clusters",
    "embedding_cosine_pairs",
    "events_hourly",
    "order_value_quantiles",
    "signup_purchase_funnel",
    "exact_duplicates",
    "language_id",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "props_rollup",
    "purchases_with_last_view",
    "pack_sequences",
    "quality_score",
    "sessionize",
    "stratified_sample",
    "simhash_fingerprints",
    "simhash_near_pairs",
    "token_stats",
    "top_orders_per_priority",
    "topk_cosine_bruteforce",
    "topk_cosine_ivf",
    "topk_cosine_lsh",
    "tpch_q1",
    "tpch_q3",
    "tpch_q4",
    "tpch_q5",
    "tpch_q6",
    "tpch_q12",
    "tpch_q7",
    "tpch_q8",
    "tpch_q9",
    "tpch_q10",
    "tpch_q13",
    "tpch_q14",
    "tpch_q15",
    "tpch_q16",
    "tpch_q17",
    "tpch_q18",
    "tpch_q19",
    "tpch_q22",
]
