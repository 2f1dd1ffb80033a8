"""Product quantization (PQ) ANN — the memory-compression scale path for
vector search, complementing IVF (partition pruning, functions/ivf.py)
and int8 scalar quantization (4x, functions/similarity.py).

PQ (Jegou et al. 2011, "Product Quantization for Nearest Neighbor
Search", IEEE TPAMI): split each dim-D vector into M subspaces of D/M
dims, k-means each subspace to K codes, store a vector as M small codes.
With M=8, K=16 over dim-64 float32 embeddings the whole vector packs
into 32 bits of ONE BIGINT: 256 B -> 4 B, 64x compression — the
difference between "embeddings fit in executor memory" and "they don't"
at corpus scale.

Determinism is engineered the way the rest of the engine does it:

- centroids are trained ONCE (driver-side numpy on the fixed reference
  sample — index training is a coordinator job, as with IVF) and then
  inlined into both engines' expressions as SCALED-INT literals;
- distances are exact int64 sums of squared scaled-int differences
  (order-independent — no float accumulation anywhere);
- code selection is first-index-of-min over the 16-distance array
  (array_position/list_position — identical tie behavior);
- ADC (asymmetric distance computation) search builds the M x K lookup
  table of partial int dot products in PYTHON integers and inlines it;
  the per-row score is M array lookups + int64 adds — map-only, inside
  whole-stage codegen, zero shuffle, bit-identical cross-engine.
"""

from __future__ import annotations

from functools import lru_cache

SCALE = 10_000  # matches similarity.py's int-scaling convention
M = 8  # subspaces
KCODES = 16  # codes per subspace -> 4 bits; 8 * 4 = 32 bits packed
DIM = 64
SUB = DIM // M

# The pretrained-codebook convention: train on the fixed smallest-sf
# sample (training cost and the codebook are independent of corpus
# size), apply at every sf — exactly how a production PQ index reuses
# one codebook across ingests.
TRAIN_PATH = "/root/testdata/sf0.001/embeddings.parquet"


@lru_cache(maxsize=4)
def train_codebooks(
    path: str = TRAIN_PATH, sample_n: int = 256, iters: int = 4
) -> tuple[tuple[tuple[int, ...], ...], ...]:
    """M codebooks of K scaled-int centroids each, trained with
    deterministic Lloyd k-means per subspace (seeds = first K sample
    subvectors, ordered by id).  Returns nested tuples (hashable for the
    lru_cache); components are round(c * SCALE) ints."""
    import numpy as np  # noqa: PLC0415
    import pyarrow.parquet as pq_  # noqa: PLC0415

    tbl = pq_.read_table(path, columns=["vec_id", "embedding"])
    order = np.argsort(tbl.column("vec_id").to_numpy())[:sample_n]
    mat = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float64)[
        order
    ]
    books = []
    for j in range(M):
        sub = mat[:, j * SUB : (j + 1) * SUB]
        cents = sub[:KCODES].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            lab = d2.argmin(axis=1)
            for c in range(KCODES):
                members = sub[lab == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books.append(
            tuple(
                tuple(int(round(x * SCALE)) for x in cv) for cv in cents
            )
        )
    return tuple(books)


@lru_cache(maxsize=4)
def query_scaled(path: str = TRAIN_PATH, vec_id: int = 0) -> tuple[int, ...]:
    """The fixed external query vector (scaled ints): the train sample's
    ``vec_id`` row.  Known at plan-build time so the ADC lookup table can
    inline as literals in both engines."""
    import numpy as np  # noqa: PLC0415
    import pyarrow.parquet as pq_  # noqa: PLC0415

    tbl = pq_.read_table(path, columns=["vec_id", "embedding"])
    ids = tbl.column("vec_id").to_numpy()
    row = tbl.column("embedding").to_pylist()[int(np.nonzero(ids == vec_id)[0][0])]
    return tuple(int(round(float(x) * SCALE)) for x in row)


def adc_lut(
    codebooks: tuple, qs: tuple[int, ...]
) -> list[list[int]]:
    """M x K table of exact int64 partial dot products sum_i q_i * c_i —
    pure Python integer arithmetic, so the literals equal what either
    engine would compute."""
    lut = []
    for j in range(M):
        qsub = qs[j * SUB : (j + 1) * SUB]
        lut.append(
            [sum(q * c for q, c in zip(qsub, cv)) for cv in codebooks[j]]
        )
    return lut


# --- expression builders (Spark SQL | DuckDB twins kept adjacent) ----------


def scaled_vec_spark(vec_col: str) -> str:
    return (
        f"transform({vec_col}, x ->"
        f" CAST(ROUND(CAST(x AS DOUBLE) * {SCALE}.0D) AS BIGINT))"
    )


def scaled_vec_sql(vec_col: str) -> str:
    return (
        f"list_transform({vec_col}, x ->"
        f" CAST(ROUND(CAST(x AS DOUBLE) * {SCALE}) AS BIGINT))"
    )


def dist_array_spark(sv_col: str, j: int, codebooks: tuple) -> str:
    """Array of K exact int64 squared distances from subvector j (of the
    staged scaled vector column) to subspace j's centroids."""
    off = j * SUB + 1
    dists = ", ".join(
        "aggregate(zip_with("
        f"slice({sv_col}, {off}, {SUB}),"
        f" array({', '.join(f'{c}L' for c in cv)}),"
        " (x, y) -> (x - y) * (x - y)),"
        " CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        for cv in codebooks[j]
    )
    return f"array({dists})"


def dist_array_sql(sv_col: str, j: int, codebooks: tuple) -> str:
    off = j * SUB + 1
    dists = ", ".join(
        "CAST(list_sum(list_transform("
        f"{sv_col}[{off}:{off + SUB - 1}],"
        f" (x, i) -> (x - ([{', '.join(str(c) for c in cv)}])[i])"
        f" * (x - ([{', '.join(str(c) for c in cv)}])[i])"
        ")) AS BIGINT)"
        for cv in codebooks[j]
    )
    return f"[{dists}]"


def code_from_dists_spark(dl_col: str) -> str:
    """First-index-of-min, 0-based (strict-min ties to the lowest code)."""
    return f"(array_position({dl_col}, array_min({dl_col})) - 1)"


def code_from_dists_sql(dl_col: str) -> str:
    return f"(list_position({dl_col}, list_min({dl_col})) - 1)"


def packed_expr(code_exprs: list[str]) -> str:
    """Pack M 4-bit codes into one BIGINT (dialect-neutral arithmetic)."""
    return (
        "("
        + " + ".join(
            f"CAST({c} AS BIGINT) * {1 << (4 * j)}"
            for j, c in enumerate(code_exprs)
        )
        + ")"
    )


def adc_score_spark(packed_col: str, lut: list[list[int]]) -> str:
    terms = []
    for j in range(M):
        arr = ", ".join(f"{v}L" for v in lut[j])
        # mask BEFORE narrowing: the packed BIGINT exceeds INT32 range
        code = f"(shiftright({packed_col}, {4 * j}) & 15)"
        terms.append(f"element_at(array({arr}), CAST({code} + 1 AS INT))")
    return "(" + " + ".join(terms) + ")"


def adc_score_sql(packed_col: str, lut: list[list[int]]) -> str:
    terms = []
    for j in range(M):
        arr = ", ".join(str(v) for v in lut[j])
        code = f"(({packed_col} >> {4 * j}) & 15)"
        terms.append(f"([{arr}])[CAST({code} + 1 AS INT)]")
    return "(" + " + ".join(terms) + ")"


# --- IVF+PQ composition (coarse quantizer + residual PQ) -------------------
# The canonical billion-scale recipe (FAISS IVFPQ; Jegou et al. 2011 §IV):
# a coarse k-means partitions the corpus into inverted lists (at scale:
# partition-pruned storage, see functions/ivf.py), and each vector stores
# only the PQ code of its RESIDUAL from its list centroid — residual
# magnitudes are much smaller than raw vectors, so the same 4-bit codes
# quantize far more precisely.  Search probes the nprobe nearest lists
# with a PER-LIST lookup table built from (query - list_centroid).
# Everything here keeps the module's exact-int convention: residuals are
# int vector differences, distances int64 sums — bit-identical in both
# engines.

K_COARSE = 8
NPROBE = 4


@lru_cache(maxsize=4)
def train_coarse(
    path: str = TRAIN_PATH, sample_n: int = 256, iters: int = 4
) -> tuple[tuple[int, ...], ...]:
    """K_COARSE full-dim centroids as scaled ints (deterministic Lloyd,
    seeds = first K sample vectors by id)."""
    import numpy as np  # noqa: PLC0415
    import pyarrow.parquet as pq_  # noqa: PLC0415

    tbl = pq_.read_table(path, columns=["vec_id", "embedding"])
    order = np.argsort(tbl.column("vec_id").to_numpy())[:sample_n]
    mat = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float64)[
        order
    ]
    cents = mat[:K_COARSE].copy()
    for _ in range(iters):
        d2 = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        lab = d2.argmin(axis=1)
        for c in range(K_COARSE):
            members = mat[lab == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return tuple(
        tuple(int(round(x * SCALE)) for x in cv) for cv in cents
    )


@lru_cache(maxsize=4)
def train_residual_codebooks(
    path: str = TRAIN_PATH, sample_n: int = 256, iters: int = 4
) -> tuple[tuple[tuple[int, ...], ...], ...]:
    """PQ codebooks trained on coarse-assignment residuals (scaled-int
    space throughout, so training-time assignment equals engine-time
    assignment exactly)."""
    import numpy as np  # noqa: PLC0415
    import pyarrow.parquet as pq_  # noqa: PLC0415

    coarse = np.asarray(train_coarse(path, sample_n, iters), dtype=np.int64)
    tbl = pq_.read_table(path, columns=["vec_id", "embedding"])
    order = np.argsort(tbl.column("vec_id").to_numpy())[:sample_n]
    mat = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float64)[
        order
    ]
    smat = np.rint(mat * SCALE).astype(np.int64)
    d2 = ((smat[:, None, :] - coarse[None, :, :]) ** 2).sum(axis=2)
    lab = d2.argmin(axis=1)
    res = (smat - coarse[lab]).astype(np.float64)
    books = []
    for j in range(M):
        sub = res[:, j * SUB : (j + 1) * SUB]
        cents = sub[:KCODES].copy()
        for _ in range(iters):
            dd = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            ll = dd.argmin(axis=1)
            for c in range(KCODES):
                members = sub[ll == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books.append(tuple(tuple(int(round(x)) for x in cv) for cv in cents))
    return tuple(books)


def coarse_dists_spark(sv_col: str, coarse: tuple) -> str:
    dists = ", ".join(
        "aggregate(zip_with("
        f"{sv_col}, array({', '.join(f'{c}L' for c in cv)}),"
        " (x, y) -> (x - y) * (x - y)),"
        " CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        for cv in coarse
    )
    return f"array({dists})"


def coarse_dists_sql(sv_col: str, coarse: tuple) -> str:
    dists = ", ".join(
        "CAST(list_sum(list_transform("
        f"{sv_col},"
        f" (x, i) -> (x - ([{', '.join(str(c) for c in cv)}])[i])"
        f" * (x - ([{', '.join(str(c) for c in cv)}])[i])"
        ")) AS BIGINT)"
        for cv in coarse
    )
    return f"[{dists}]"


def residual_spark(sv_col: str, list_col: str, coarse: tuple) -> str:
    """Residual vector sv - coarse[list_id]: the list centroid is picked
    from an inline K_COARSE x DIM literal by the assigned list id."""
    rows = ", ".join(
        f"array({', '.join(f'{c}L' for c in cv)})" for cv in coarse
    )
    cent = f"element_at(array({rows}), CAST({list_col} + 1 AS INT))"
    return f"zip_with({sv_col}, {cent}, (x, y) -> x - y)"


def residual_sql(sv_col: str, list_col: str, coarse: tuple) -> str:
    rows = ", ".join(f"[{', '.join(str(c) for c in cv)}]" for cv in coarse)
    cent = f"([{rows}])[CAST({list_col} + 1 AS INT)]"
    return f"list_transform({sv_col}, (x, i) -> x - {cent}[i])"


def probe_lists_py(qs: tuple[int, ...], coarse: tuple, nprobe: int = NPROBE) -> list[int]:
    """The nprobe nearest coarse lists to the query — exact int math on
    the driver (centroid table is K_COARSE x DIM ints)."""
    dists = [
        (sum((q - c) ** 2 for q, c in zip(qs, cv)), lid)
        for lid, cv in enumerate(coarse)
    ]
    return [lid for _, lid in sorted(dists)[:nprobe]]
