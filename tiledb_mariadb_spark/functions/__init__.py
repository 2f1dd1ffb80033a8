"""Training-data operators: dedup, similarity/ANN, text analysis,
multimodal plumbing, and corpus-preparation pipeline stages.

The commonly composed entry points are re-exported here so a pipeline
reads as ``from tiledb_mariadb_spark.functions import train_test_split,
lsh_candidate_pairs, ivf_search_batch, ...``; the per-topic modules
(``dedup``, ``similarity``, ``ivf``, ``text``, ``pipeline``,
``multimodal``, ``sql_macros``) remain importable for the full surface
including the DuckDB oracle twins.
"""

from tiledb_mariadb_spark.functions.dedup import (  # noqa: F401
    band_explode,
    exact_dedup_groups,
    lsh_candidate_pairs,
    lsh_probe_pairs,
    minhash_signatures,
    probe_lsh_index,
    setsim_join,
    simhash16,
    simhash_neardup_pairs,
    with_minhash_inline,
    with_shingles,
    write_lsh_index,
)
from tiledb_mariadb_spark.functions.ivf import (  # noqa: F401
    append_ivf_index,
    assign_lists,
    ivf_search,
    ivf_search_batch,
    train_centroids,
    write_ivf_index,
)
from tiledb_mariadb_spark.functions.pipeline import (  # noqa: F401
    connected_components,
    mix_corpus,
    pack_greedy,
    pack_sequential,
    redact_pii,
    stratified_sample,
    train_test_split,
)
from tiledb_mariadb_spark.functions.similarity import (  # noqa: F401
    cosine_topk,
    cosine_topk_batch,
)
from tiledb_mariadb_spark.functions.sql_macros import (  # noqa: F401
    register_sql_functions,
)
from tiledb_mariadb_spark.functions.text import (  # noqa: F401
    fingerprint,
    lang_id,
    quality_features,
    token_count,
)
