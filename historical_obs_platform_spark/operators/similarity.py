"""Similarity search over embedding columns (``array<float>``).

- **Brute-force cosine top-k** — the correctness baseline: broadcast
  the (small) query set against the corpus, dot/norm via ``aggregate``
  / ``zip_with`` (JVM-side higher-order functions, no Python), rank
  with a per-query window. One pass over the corpus regardless of
  query count.
- **LSH-bucketed ANN** — the scale path: deterministic random
  hyperplanes (md5-derived, engine-portable), sign bits form a bucket
  key; candidates come only from the query's bucket. Probing more
  buckets trades recall for cost. At 100 TB the corpus never
  self-joins: it is hashed once (one shuffle on bucket) and queries
  broadcast into buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

HEX = "0123456789abcdef"

# Cell-count bound for the driver-local centroid regime: at or below
# it, centroid tables are collected once and scored by the Arrow
# kernel (map-only, no join); above it, the value-identical
# distributed form (broadcast crossJoin + struct-max) takes over so
# "grow n_cells with the corpus" keeps working at any cell count.
# Module-level so the equivalence tests can shrink it and exercise
# the distributed path on small fixtures.
MAX_LOCAL_CELLS = 4096


def as_double_array(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right double dot product (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_arrow(a: Column, b: Column) -> Column:
    """Arrow-vectorized cosine ``dot(a,b) / (norm(a) · norm(b))``,
    bit-identical to the scalar fold composition (all three
    accumulations run dimension-major from an explicit 0.0, then
    sqrt/multiply/divide as scalar IEEE ops). Exists because a
    post-join cosine built from pre-projected norm COLUMNS is a trap:
    Catalyst collapses the projections into the join output, silently
    re-evaluating both 64-element norm folds per PAIR (measured ~3×
    the whole-query wall on the within-cell confirm). One UDF call
    keeps the per-pair work in numpy. Null/ragged inputs → null.

    The bit-identity claim holds for nonzero-norm vectors. A
    zero-norm input is degenerate on every path, but degenerates
    DIFFERENTLY: the scalar fold raises under ANSI (divide by zero —
    see ``_unit``) or yields NaN with ANSI off, while this kernel's
    NaN becomes NULL in the pandas→Arrow conversion (pandas cannot
    carry a NaN-vs-null distinction). Filter zero vectors upstream
    where the difference matters."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(pa, pb):
        out = np.full(len(pa), np.nan)
        ok = (pa.notna() & pb.notna()).to_numpy()
        if ok.any():
            lens = {len(v) for v in pa[ok]} | {len(v) for v in pb[ok]}
            if len(lens) == 1:
                A = np.stack([np.asarray(v, float) for v in pa[ok]])
                B = np.stack([np.asarray(v, float) for v in pb[ok]])
                d = np.zeros(A.shape[0])
                na = np.zeros(A.shape[0])
                nb = np.zeros(A.shape[0])
                for i in range(A.shape[1]):
                    ca, cb = A[:, i], B[:, i]
                    d += ca * cb
                    na += ca * ca
                    nb += cb * cb
                out[ok] = d / (np.sqrt(na) * np.sqrt(nb))
            else:
                for i, (va, vb) in enumerate(zip(pa, pb)):
                    if va is None or vb is None or len(va) != len(vb):
                        continue
                    d = na = nb = 0.0
                    for x, y in zip(va, vb):
                        d += x * y
                        na += x * x
                        nb += y * y
                    out[i] = d / ((na ** 0.5) * (nb ** 0.5))
        return pd.Series(out)

    # asNondeterministic: the kernel IS deterministic, but without the
    # marker a filter on its output (`cosine >= thr`) is pushed below
    # the producing projection and the whole kernel re-evaluates per
    # row — guide §4.4's duplicated BatchEvalPython, observed as two
    # ArrowEvalPython nodes around the threshold Filter in the
    # semdedup streams (plans/r08). The marker yields one evaluation;
    # values are unchanged.
    return _cos.asNondeterministic()(a, b)


def nearest_cell_arrow(vec: Column, cent_rows, normalize: bool = True) -> Column:
    """Arrow-vectorized nearest-centroid assignment from a RAW vector
    column against a driver-side centroid list ``[(cell, unit_array),
    …]`` (the collected output of ``ivf_centroids``). Bit-identical
    to the ``_assign_cells`` path: the norm accumulates
    dimension-major (== the scalar fold), each element divides by it,
    every per-cell score accumulates dimension-major, and exact-score
    ties take the smallest cell (np.argmax first-occurrence over the
    cell-ascending score matrix). Exists because the in-row literal
    expression form (array_max over array(struct(fold-dot, cell)))
    re-evaluates the literal centroid arrays per row per cell —
    measured ~0.25 ms per 64-dim fold, the dominant cost of the
    streaming semdedup at any cell count."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    order = sorted(cent_rows, key=lambda t: t[0])
    cells = np.asarray([c for c, _ in order], dtype=np.int32)
    cmat = np.stack([np.asarray(a, float) for _, a in order])  # C×D

    @pandas_udf("int")
    def _cell(pv):
        out = np.full(len(pv), -1, dtype=np.int32)
        # null or wrong-dimension vectors degrade to a null cell (the
        # pre-kernel form produced null scores for them) instead of
        # crashing np.stack on a ragged batch; dtype=bool keeps the
        # mask invertible on an EMPTY batch (np.array over an empty
        # list comprehension is float64, and ~float raises)
        ok = np.fromiter(
            (
                v is not None and len(v) == cmat.shape[1]
                for v in pv
            ),
            dtype=bool,
            count=len(pv),
        )
        if ok.any():
            idx = np.flatnonzero(ok)
            A = np.stack([np.asarray(v, float) for v in pv[ok]])
            if normalize:
                nrm = np.zeros(A.shape[0])
                for d in range(A.shape[1]):
                    nrm += A[:, d] * A[:, d]
                # zero-norm (or non-finite) vectors have no direction:
                # degrade them to a null cell like wrong-dimension
                # inputs instead of letting NaN scores argmax to the
                # first cell
                good = np.isfinite(nrm) & (nrm > 0)
                if not good.all():
                    ok[idx[~good]] = False
                    A = A[good]
                    nrm = nrm[good]
                U = A / np.sqrt(nrm)[:, None] if len(A) else A
            else:
                # caller's vectors are ALREADY the exact values to
                # score (e.g. `_unit` output) — renormalizing would
                # divide by a norm that is not bitwise 1.0
                U = A
            scores = np.zeros((A.shape[0], cmat.shape[0]))
            for d in range(A.shape[1]):
                scores += U[:, d, None] * cmat[None, :, d]
            out[ok] = cells[np.argmax(scores, axis=1)]
        res = pd.Series(pd.array(out, dtype="Int32"))
        res[~ok] = pd.NA
        return res

    # asNondeterministic: deterministic kernel, but the cell column
    # feeds equi-joins, and InferFiltersFromConstraints pushes the
    # inferred `isnotnull(cell)` below the producing projection —
    # re-evaluating the FULL kernel (plus the inlined norm fold) once
    # per row before the real evaluation runs again above (two
    # ArrowEvalPython `_cell` nodes in the s_ivf_ann_topk and
    # st_semdedup plans, plans/r08). Guide §4.4; values unchanged.
    return _cell.asNondeterministic()(vec)


def dot_arrow(a: Column, b: Column) -> Column:
    """Arrow-vectorized dot product, bit-identical to ``dot``: the
    kernel accumulates dimension-major (acc += a[:,d]·b[:,d], d
    ascending from an explicit 0.0), which replays the scalar fold's
    left-to-right addition order for every row simultaneously — the
    same order-preservation trick as ``blocked_cosine_pairs``. Use in
    hot paths where the interpreted per-element lambda dominates
    (measured ~6× on 64-dim arrays at 10⁵ pairs); the result column
    is exchangeable with ``dot`` in any oracle-checked expression.
    Ragged or null inputs yield null, matching the zip_with form.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # no type hints: the module's `from __future__ import annotations`
    # turns them into strings, which the pandas_udf inference rejects
    @pandas_udf("double")
    def _dot(pa, pb):
        out = np.full(len(pa), np.nan)
        ok = pa.notna() & pb.notna()
        if ok.any():
            lens = {len(v) for v in pa[ok]} | {len(v) for v in pb[ok]}
            if len(lens) == 1:
                A = np.stack([np.asarray(v, float) for v in pa[ok]])
                B = np.stack([np.asarray(v, float) for v in pb[ok]])
                acc = np.zeros(A.shape[0])
                for d in range(A.shape[1]):
                    acc += A[:, d] * B[:, d]
                out[ok.to_numpy()] = acc
            else:
                for i, (va, vb) in enumerate(zip(pa, pb)):
                    if va is None or vb is None or len(va) != len(vb):
                        continue
                    s = 0.0
                    for x, y in zip(va, vb):
                        s += x * y
                    out[i] = s
        return pd.Series(out)

    return _dot(a, b)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    ``queries`` is broadcast (it is the small side by construction);
    the corpus streams through one stage — scan, score, per-query
    window top-k. Self-matches are excluded.
    Returns (query_id, neighbor_id, cosine_sim, rank).
    """
    # Norms are precomputed per side BEFORE the join: inside the join
    # they would be re-evaluated (interpreted higher-order lambdas)
    # for every (query, corpus) pair — measured ~9× slower at sf0.1.
    return cosine_topk_prepped(
        prep_corpus(corpus, id_col, vec_col),
        prep_queries(queries, id_col, vec_col),
        k=k,
        round_to=round_to,
    )


def prep_corpus(
    corpus: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(neighbor_id, __cv double-array, __cn norm) — the corpus-side
    projection every LSH/exact arm needs. Factored out so a harness
    comparing several retrieval strategies can ``persist()`` ONE prep
    and share it (one parquet scan + one norm fold for all arms)."""
    return corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double_array(vec_col).alias("__cv"),
    ).withColumn("__cn", norm(F.col("__cv")))


def prep_queries(
    queries: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(query_id, __qv, __qn) — query-side twin of ``prep_corpus``."""
    return queries.select(
        F.col(id_col).alias("query_id"),
        as_double_array(vec_col).alias("__qv"),
    ).withColumn("__qn", norm(F.col("__qv")))


def cosine_topk_prepped(
    c: DataFrame, q: DataFrame, k: int = 5, round_to: int = 6
) -> DataFrame:
    """Exact top-k over ALREADY-PREPPED sides (see ``prep_corpus``)."""
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine_sim",
            F.round(
                dot(F.col("__qv"), F.col("__cv"))
                / (F.col("__qn") * F.col("__cn")),
                round_to,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """Contrastive hard-negative mining: for each query, the top-k
    most-similar corpus vectors carrying a DIFFERENT label — the
    pairs a contrastive/embedding trainer wants as negatives because
    the model currently confuses them. Same plan shape as
    ``cosine_topk`` (queries broadcast, corpus streams once, window
    top-k per query); the label inequality joins into the broadcast
    condition so non-candidates are dropped before scoring.

    Returns (query_id, query_label, neighbor_id, neighbor_label,
    cosine_sim, rank).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("query_label"),
        as_double_array(vec_col).alias("__qv"),
    ).withColumn("__qn", norm(F.col("__qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("neighbor_label"),
        as_double_array(vec_col).alias("__cv"),
    ).withColumn("__cn", norm(F.col("__cv")))
    scored = c.join(
        F.broadcast(q),
        (F.col("query_id") != F.col("neighbor_id"))
        & (F.col("query_label") != F.col("neighbor_label")),
    ).withColumn(
        "cosine_sim",
        F.round(
            dot(F.col("__qv"), F.col("__cv"))
            / (F.col("__qn") * F.col("__cn")),
            round_to,
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "query_label",
            "neighbor_id",
            "neighbor_label",
            "cosine_sim",
            "rank",
        )
    )


def _hyperplane_consts(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: component d is the
    centered value of md5('p<plane>:d<d>')'s first hex digit — fully
    reproducible across engines and runs, no RNG state. Computed
    driver-side (hashlib md5 == SQL md5) so the Spark expression is a
    pure literal chain."""
    import hashlib

    return [
        int(hashlib.md5(f"p{plane}:d{d}".encode()).hexdigest()[0], 16)
        + 1
        - 8.5
        for d in range(dim)
    ]


def _const_dot(vec: Column, consts: list[float]) -> Column:
    """vec · consts via the sequential-fold ``dot`` against a literal
    array. NB an unrolled 64-term element_at chain was measured ~3×
    SLOWER than the interpreted lambda here (the 768-node expression
    tree swamps codegen); the lambda fold also keeps the addition
    order bit-identical to the oracle's list_dot_product."""
    return dot(vec, F.array(*[F.lit(c) for c in consts]))


def lsh_bucket_expr(
    vec: Column, dim: int, n_planes: int = 4, table_idx: int = 0
) -> Column:
    """Sign-bit bucket key for one hash table: bit p =
    (vec · hyperplane_{table·planes+p}) > 0."""
    bits = []
    for p in range(n_planes):
        plane = table_idx * n_planes + p
        bits.append(
            F.when(
                _const_dot(vec, _hyperplane_consts(dim, plane)) > 0,
                F.lit("1"),
            ).otherwise(F.lit("0"))
        )
    return F.concat(F.lit(f"t{table_idx}:"), *bits)


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 2,
    round_to: int = 6,
    prepped_corpus: DataFrame | None = None,
    corpus_buckets: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k: score only candidates sharing an LSH bucket
    with the query in ANY of ``n_tables`` hash tables (multi-table
    OR-amplification: more tables → higher recall, more candidates).

    Recall < 1 by design; the bucket joins replace the full cross
    product. The 100 TB plan: the corpus is hashed once per table
    (map-only), shuffled once on bucket, and queries broadcast — the
    corpus never self-joins.

    ``prepped_corpus`` / ``corpus_buckets`` let a caller supply the
    stored index sides (``prep_corpus`` / ``lsh_corpus_buckets``
    output for the same corpus and knobs) instead of rebuilding them
    — the production shape, where the hashed corpus is a persisted
    artifact and only queries hash fresh.
    """
    c = (
        prepped_corpus
        if prepped_corpus is not None
        else prep_corpus(corpus, id_col, vec_col)
    )
    q = prep_queries(queries, id_col, vec_col)
    cand = lsh_candidates(
        corpus_buckets
        if corpus_buckets is not None
        else lsh_corpus_buckets(c, dim, n_planes, n_tables),
        lsh_query_keys(q, dim, n_planes, n_tables, n_probes=0),
    )
    return score_candidates_topk(cand, c, q, k=k, round_to=round_to)


def lsh_corpus_buckets(
    c: DataFrame, dim: int, n_planes: int = 4, n_tables: int = 2
) -> DataFrame:
    """One (neighbor_id, __b) row per (corpus vector, hash table) over
    a PREPPED corpus (``prep_corpus``). Bucket keys carry the ``t<i>:``
    prefix, so the union across tables can never collide cross-table.
    This is the corpus-side hashing pass — the expensive side at
    100 TB — factored out so a recall harness comparing plain LSH with
    multi-probe builds (and persists) it ONCE for both arms."""
    out = None
    for t in range(n_tables):
        cb = c.select(
            "neighbor_id",
            lsh_bucket_expr(F.col("__cv"), dim, n_planes, t).alias("__b"),
        )
        out = cb if out is None else out.unionByName(cb)
    return out


def lsh_query_keys(
    q: DataFrame,
    dim: int,
    n_planes: int = 4,
    n_tables: int = 2,
    n_probes: int = 0,
) -> DataFrame:
    """(query_id, __b) probe keys over a PREPPED query set: the base
    bucket per table, plus — when ``n_probes`` > 0 — the multi-probe
    Hamming-1 buckets from flipping the ``n_probes`` lowest-|margin|
    sign bits (Lv et al., VLDB'07). Plain LSH and multi-probe differ
    ONLY in this (broadcast-sized) key list; the corpus-side buckets
    are identical."""
    out = None
    for t in range(n_tables):
        if n_probes <= 0:
            qb = q.select(
                "query_id",
                lsh_bucket_expr(F.col("__qv"), dim, n_planes, t).alias(
                    "__b"
                ),
            )
        else:
            qdots = [
                _const_dot(
                    F.col("__qv"),
                    _hyperplane_consts(dim, t * n_planes + p),
                )
                for p in range(n_planes)
            ]
            qbits = [
                F.when(d > 0, F.lit("1")).otherwise(F.lit("0"))
                for d in qdots
            ]
            flips = [
                F.when(d > 0, F.lit("0")).otherwise(F.lit("1"))
                for d in qdots
            ]
            # probe order: ascending |dot| (margin), plane index
            # breaks exact ties — sort_array on (margin, plane)
            order = F.sort_array(
                F.array(
                    *[
                        F.struct(
                            F.abs(qdots[p]).alias("m"),
                            F.lit(p).alias("p"),
                        )
                        for p in range(n_planes)
                    ]
                )
            )
            keys = [F.concat(F.lit(f"t{t}:"), *qbits)]
            for j in range(min(n_probes, n_planes)):
                flip_p = F.element_at(order, j + 1).getField("p")
                keys.append(
                    F.concat(
                        F.lit(f"t{t}:"),
                        *[
                            F.when(flip_p == pos, flips[pos]).otherwise(
                                qbits[pos]
                            )
                            for pos in range(n_planes)
                        ],
                    )
                )
            qb = q.select(
                "query_id", F.explode(F.array(*keys)).alias("__b")
            ).distinct()
        out = qb if out is None else out.unionByName(qb)
    return out


def lsh_candidates(cb: DataFrame, qkeys: DataFrame) -> DataFrame:
    """Bucket-equality candidate pairs: corpus buckets ⋈ broadcast
    query keys. Self-pairs and cross-table duplicates are dropped."""
    return (
        cb.join(F.broadcast(qkeys), "__b")
        .select("query_id", "neighbor_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .distinct()
    )


def score_candidates_topk(
    cand: DataFrame,
    c: DataFrame,
    q: DataFrame,
    k: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """Exact-cosine re-rank of a candidate pair set against prepped
    sides; per-query window top-k."""
    scored = (
        cand.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .withColumn(
            "cosine_sim",
            F.round(
                dot(F.col("__qv"), F.col("__cv"))
                / (F.col("__qn") * F.col("__cn")),
                round_to,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def lsh_multiprobe_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 2,
    n_probes: int = 2,
    round_to: int = 6,
    prepped_corpus: DataFrame | None = None,
    corpus_buckets: DataFrame | None = None,
) -> DataFrame:
    """Multi-probe LSH top-k (Lv et al., VLDB'07): besides its own
    bucket, each query probes the ``n_probes`` Hamming-1 neighbor
    buckets obtained by flipping the sign bits whose hyperplane dot
    product is CLOSEST to zero — the planes most likely to have
    hashed a true neighbor to the other side. Probing trades query
    fan-out for hash tables: recall comparable to a larger
    ``n_tables`` while the corpus is hashed (and shuffled) for fewer
    tables — at 100 TB the corpus-side work is what matters, and it
    is unchanged by probing (probes multiply only the broadcast-sized
    query bucket list).

    Deterministic end-to-end: md5-derived hyperplanes, probe order by
    (|dot|, plane index) — the oracle replays plane dots, flip
    selection, bucket join, exact cosine, rank.
    """
    # corpus side hashes through the SAME helper as lsh_ann_topk —
    # the recall comparison assumes both paths bucket the corpus
    # identically; prepped_corpus/corpus_buckets supply the stored
    # index sides exactly as in lsh_ann_topk
    c = (
        prepped_corpus
        if prepped_corpus is not None
        else prep_corpus(corpus, id_col, vec_col)
    )
    q = prep_queries(queries, id_col, vec_col)
    cand = lsh_candidates(
        corpus_buckets
        if corpus_buckets is not None
        else lsh_corpus_buckets(c, dim, n_planes, n_tables),
        lsh_query_keys(q, dim, n_planes, n_tables, n_probes=n_probes),
    )
    return score_candidates_topk(cand, c, q, k=k, round_to=round_to)


# ------------------------------------------------------------ IVF ANN
def _unit(vec: Column) -> Column:
    n = norm(vec)
    return F.transform(vec, lambda x: x / n)


def _assign_cells(
    vectors: DataFrame, centroids: DataFrame, id_name: str
) -> DataFrame:
    """Nearest-centroid assignment, map-only: the (tiny, ≤4096-row by
    contract) centroid table is collected once and scored per row by
    the Arrow kernel — exact-score ties break to the smallest cell id
    so assignment is deterministic (and engine-portable for the
    DuckDB oracle). Bit-identical to the previous broadcast-crossJoin
    + struct-max form (the kernel replays the fold's addition order),
    but without 1 interpreted 64-element fold per (vector, cell) —
    measured ~0.25 ms each, the dominant cost of every IVF-family
    query. ``__uv`` is scored as-is (no renormalization).

    Past 4096 centroids the collect stops being driver-cheap and the
    original distributed form takes over (broadcast crossJoin +
    struct-max, value-identical) — so the documented "grow n_cells
    with the corpus" recipe keeps working at any cell count."""
    rows = centroids.select("cell", "__cent").limit(
        MAX_LOCAL_CELLS + 1
    ).collect()
    if len(rows) > MAX_LOCAL_CELLS:
        scored = vectors.crossJoin(F.broadcast(centroids)).withColumn(
            "__s", dot(F.col("__uv"), F.col("__cent"))
        )
        best = F.max(
            F.struct(
                F.col("__s").alias("s"), (-F.col("cell")).alias("negcell")
            )
        )
        return scored.groupBy(id_name).agg(
            (-best.getField("negcell")).alias("cell")
        )
    cent_rows = [(r["cell"], r["__cent"]) for r in rows]
    return vectors.select(
        id_name,
        nearest_cell_arrow(
            F.col("__uv"), cent_rows, normalize=False
        ).alias("cell"),
    )


def attach_cells(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """``_assign_cells`` that KEEPS the caller's columns: appends the
    nearest-centroid ``cell`` as an in-row kernel column instead of
    returning an (id, cell) table the caller must join back — at
    corpus scale that join is a corpus⋈corpus shuffle the map-only
    form never pays. Same ≤4096-local / distributed-fallback split,
    value-identical assignments (same kernel); expects ``__uv``."""
    rows = centroids.select("cell", "__cent").limit(
        MAX_LOCAL_CELLS + 1
    ).collect()
    if len(rows) > MAX_LOCAL_CELLS:
        scored = vectors.crossJoin(F.broadcast(centroids)).withColumn(
            "__s", dot(F.col("__uv"), F.col("__cent"))
        )
        best = F.max(
            F.struct(
                F.col("__s").alias("s"), (-F.col("cell")).alias("negcell")
            )
        )
        keep = [c for c in vectors.columns]
        return (
            scored.groupBy(*keep)
            .agg((-best.getField("negcell")).alias("cell"))
        )
    cent_rows = [(r["cell"], r["__cent"]) for r in rows]
    return vectors.withColumn(
        "cell",
        nearest_cell_arrow(F.col("__uv"), cent_rows, normalize=False),
    )


def ivf_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    iters: int = 1,
) -> DataFrame:
    """IVF coarse quantizer: deterministic seeds (the ``n_cells``
    lowest-id vectors, unit-normalized) refined by ``iters`` Lloyd
    steps. Each step is one broadcast assignment plus one elementwise
    mean (posexplode → per-(cell, dim) avg → re-assembled array):
    every stage is a narrow map or a partial-agg shuffle of
    (cell, dim) rows — nothing scales with corpus² .
    Returns (cell, __cent) with unit-norm centroids."""
    vecs = corpus.select(
        F.col(id_col).alias("__id"),
        _unit(as_double_array(vec_col)).alias("__uv"),
    )
    if n_cells > MAX_LOCAL_CELLS:
        # past the local-rows contract: distributed seed + Lloyd (the
        # original form — value-identical, centroids stay a lineage)
        w = Window.orderBy("__id")
        cent = (
            vecs.orderBy("__id")
            .limit(n_cells)
            .withColumn("cell", F.row_number().over(w) - 1)
            .select("cell", F.col("__uv").alias("__cent"))
        )
        for _ in range(iters):
            assign = _assign_cells(vecs, cent, "__id")
            means = (
                vecs.join(assign, "__id")
                .select("cell", F.posexplode("__uv").alias("pos", "val"))
                .groupBy("cell", "pos")
                .agg(F.round(F.avg("val"), 9).alias("val"))
                .groupBy("cell")
                .agg(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("pos", "val"))
                        ),
                        lambda s: s["val"],
                    ).alias("__mean")
                )
            )
            cent = means.select(
                "cell", _unit(F.col("__mean")).alias("__cent")
            )
        return cent

    # ≤4096 cells (the documented local-rows regime): exactly TWO
    # jobs per build — a limit-n seed collect and one Lloyd-mean
    # aggregation per iteration — instead of a window over the seed
    # lineage re-executed per consumer plus a corpus⋈corpus join of
    # vectors against their assignments (measured: the join + extra
    # stages were ~half of every IVF-family query's fixed cost).
    import math

    def _unit_local(v):
        # replays the JVM fold bit-for-bit: left-to-right acc + x*x
        # from an explicit 0.0, IEEE sqrt, per-element divide
        acc = 0.0
        for x in v:
            acc += x * x
        n = math.sqrt(acc)
        return [x / n for x in v]

    seeds = (
        corpus.select(
            F.col(id_col).alias("__id"),
            as_double_array(vec_col).alias("__v"),
        )
        .orderBy("__id")
        .limit(n_cells)
        .collect()
    )
    cent_rows = [
        (i, _unit_local(r["__v"]))
        for i, r in enumerate(sorted(seeds, key=lambda r: r["__id"]))
    ]
    for _ in range(iters):
        # assignment rides the aggregation scan (the Arrow kernel is
        # map-only) but MUST be materialized behind a barrier before
        # the posexplode: ExtractPythonUDFs hoists the pandas_udf
        # above the Generate, so without the barrier the kernel
        # re-evaluates once per exploded (row, dim) pair — dim× the
        # work, measured 64× (25 min vs ~40 s) at 200k×447 cells.
        # round(avg, 9): Spark and DuckDB sum partial aggregates in
        # different orders; rounding the mean well above double-ulp
        # (but far below any signal) makes the refined centroids —
        # and everything downstream — bit-identical across engines.
        assigned = vecs.select(
            nearest_cell_arrow(
                F.col("__uv"), cent_rows, normalize=False
            ).alias("cell"),
            "__uv",
        ).localCheckpoint(eager=False)
        agg_rows = (
            assigned.select(
                "cell", F.posexplode("__uv").alias("pos", "val")
            )
            .groupBy("cell", "pos")
            .agg(F.round(F.avg("val"), 9).alias("val"))
            .collect()
        )
        by_cell: dict = {}
        for r in agg_rows:
            by_cell.setdefault(r["cell"], {})[r["pos"]] = r["val"]
        cent_rows = [
            (cell, _unit_local([d[p] for p in sorted(d)]))
            for cell, d in sorted(by_cell.items())
        ]
    return corpus.sparkSession.createDataFrame(
        cent_rows, "cell int, __cent array<double>"
    )


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    iters: int = 1,
    round_to: int = 6,
    cents: DataFrame | None = None,
    corpus_cells: DataFrame | None = None,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors live in their nearest
    coarse-quantizer cell; each query probes its ``nprobe`` closest
    cells and scores only those inverted lists.

    The 100 TB plan: centroids are tiny and broadcast everywhere; the
    corpus is assigned once (map-only) and shuffled once on ``cell``;
    expected candidate volume per query is corpus·nprobe/n_cells —
    the knob trades recall for scan fraction, and no stage is
    quadratic in the corpus.

    ``cents`` lets a caller supply an already-built centroid table
    (e.g. a session-shared build) instead of refitting; it must come
    from ``ivf_centroids`` with the same (corpus, n_cells, iters).
    ``corpus_cells`` additionally supplies the cell-assigned prepped
    corpus (the ``attach_cells`` output for those centroids) — the
    inverted-list artifact an IVF deployment stores."""
    cent = (
        cents
        if cents is not None
        else ivf_centroids(corpus, id_col, vec_col, n_cells, iters)
    )

    if corpus_cells is not None:
        c_cells = corpus_cells
    else:
        c = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            as_double_array(vec_col).alias("__cv"),
        ).withColumn("__cn", norm(F.col("__cv")))
        c = c.withColumn(
            "__uv", F.transform("__cv", lambda x: x / F.col("__cn"))
        )
        # cell rides the corpus rows (map-only kernel) so candidates
        # carry their vectors — no (id, cell)⋈corpus join to recover
        # them
        c_cells = attach_cells(c, cent)

    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double_array(vec_col).alias("__qv"),
    ).withColumn("__qn", norm(F.col("__qv")))
    q_scored = (
        q.withColumn("__uv", F.transform("__qv", lambda x: x / F.col("__qn")))
        .crossJoin(F.broadcast(cent))
        .withColumn(
            "__s", dot(F.col("__uv"), F.col("__cent"))
        )
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("__s"), F.asc("cell"))
    q_probe = (
        q_scored.withColumn("__r", F.row_number().over(wq))
        .where(F.col("__r") <= nprobe)
        .select("query_id", "cell")
    )

    # every corpus vector lives in exactly ONE cell and q_probe is
    # distinct per (query, cell), so the probe join cannot duplicate a
    # (query, neighbor) pair — no distinct needed, and the candidates
    # already carry __cv/__cn for scoring
    scored = (
        c_cells.join(F.broadcast(q_probe), "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "__cv", "__cn")
        .join(F.broadcast(q.select("query_id", "__qv", "__qn")), "query_id")
        .withColumn(
            "cosine_sim",
            F.round(
                dot(F.col("__qv"), F.col("__cv"))
                / (F.col("__qn") * F.col("__cn")),
                round_to,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


# ---------------------------------------------------------------- MIPS
def mips_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """Exact maximum-inner-product top-k (the retrieval scoring a
    dot-product recommender / un-normalized embedding model needs —
    cosine ranking is WRONG when vector norms carry signal). Same
    plan shape as ``cosine_topk``: queries broadcast, corpus streams
    once, per-query window top-k. Self-matches excluded."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double_array(vec_col).alias("__qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double_array(vec_col).alias("__cv"),
    )
    scored = c.join(
        F.broadcast(q), F.col("query_id") != F.col("neighbor_id")
    ).withColumn(
        "inner_product",
        F.round(dot(F.col("__qv"), F.col("__cv")), round_to),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("inner_product"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "inner_product", "rank")
    )


def mips_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 2,
    round_to: int = 6,
) -> DataFrame:
    """Approximate MIPS via the norm-augmentation reduction
    (Bachrach et al. RecSys'14; cf. Shrivastava & Li NIPS'14
    asymmetric LSH): corpus x → [x, √(M²−‖x‖²)] where M is the max
    corpus norm (every augmented corpus vector has norm exactly M),
    query q → [q, 0]; then q·x orders like the cosine of the
    augmented pair, so the md5 sign-bit hyperplanes in dim+1 bucket
    MIPS candidates. Candidates are scored by the EXACT original
    inner product, so the only approximation is candidate recall.

    100 TB shape: one scalar max (broadcast) to get M, corpus hashed
    once per table map-only, queries broadcast into buckets — the
    corpus never self-joins. ``greatest(0, M²−‖x‖²)`` guards the
    float-sqrt of the max-norm row itself.
    """
    m = corpus.select(
        F.max(norm(as_double_array(vec_col))).alias("__m")
    )
    c = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            as_double_array(vec_col).alias("__cv"),
        )
        .crossJoin(F.broadcast(m))
        .withColumn(
            "__aug",
            F.concat(
                F.col("__cv"),
                F.array(
                    F.sqrt(
                        F.greatest(
                            F.lit(0.0),
                            F.col("__m") * F.col("__m")
                            - dot(F.col("__cv"), F.col("__cv")),
                        )
                    )
                ),
            ),
        )
        # referenced by every table's bucket build AND the exact
        # rescore (plans are trees — each reference re-ran the corpus
        # scan + the max-norm aggregate); one materialization. This
        # augmented table is the stored artifact of a MIPS-LSH
        # deployment anyway.
        .localCheckpoint(eager=False)
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double_array(vec_col).alias("__qv"),
    ).withColumn(
        "__aug", F.concat(F.col("__qv"), F.array(F.lit(0.0)))
    )
    cand = None
    for t in range(n_tables):
        cb = c.select(
            "neighbor_id",
            lsh_bucket_expr(F.col("__aug"), dim + 1, n_planes, t).alias(
                "__b"
            ),
        )
        qb = q.select(
            "query_id",
            lsh_bucket_expr(F.col("__aug"), dim + 1, n_planes, t).alias(
                "__b"
            ),
        )
        pairs = cb.join(F.broadcast(qb), "__b").select(
            "query_id", "neighbor_id"
        )
        cand = pairs if cand is None else cand.unionByName(pairs)
    cand = cand.where(F.col("query_id") != F.col("neighbor_id")).distinct()
    scored = (
        cand.join(c.select("neighbor_id", "__cv"), "neighbor_id")
        .join(F.broadcast(q.select("query_id", "__qv")), "query_id")
        .withColumn(
            "inner_product",
            F.round(dot(F.col("__qv"), F.col("__cv")), round_to),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("inner_product"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "inner_product", "rank")
    )


# ------------------------------------------------- product quantization
def l2sq(a: Column, b: Column) -> Column:
    """Squared L2 distance as ``a·a − 2(a·b) + b·b`` — composed from
    the same sequential-fold ``dot`` both engines share, in fixed
    left-associative order, so Spark and DuckDB produce bit-identical
    doubles (the expansion avoids a zip_with form DuckDB lacks)."""
    return dot(a, a) - F.lit(2.0) * dot(a, b) + dot(b, b)


def _subvectors(
    df: DataFrame, id_name, vec: Column, m: int, sub_dim: int
) -> DataFrame:
    """(id…, s, sv): the m contiguous sub_dim-length slices per vector
    — map-only (explode of an in-row literal array of slices).
    ``id_name`` may be one column name or a list (composite key)."""
    ids = [id_name] if isinstance(id_name, str) else list(id_name)
    parts = F.array(
        *[
            F.struct(
                F.lit(s).alias("s"),
                F.slice(vec, s * sub_dim + 1, sub_dim).alias("sv"),
            )
            for s in range(m)
        ]
    )
    return df.select(
        *[F.col(c) for c in ids], F.explode(parts).alias("__p")
    ).select(*ids, F.col("__p.s").alias("s"), F.col("__p.sv").alias("sv"))


def _pq_assign(subs: DataFrame, cents: DataFrame, id_name: str) -> DataFrame:
    """Nearest-centroid code per (id, s), map-only: the m·ksub
    codebook (bounded driver-side by construction) is collected once
    and every sub-vector scored in one Arrow pass. Exact-distance
    ties break to the smallest code, matching the oracle's ``ORDER BY
    d2, j``; the kernel replays ``l2sq``'s exact composition —
    ``(a·a − 2(a·b)) + b·b`` with every dot a dimension-major
    fold — so results are bit-identical to the previous
    broadcast-join + interpreted-fold form (which paid ~3 folds per
    (row, subspace, centroid))."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    rows = cents.select("s", "j", "__cent").limit(4097).collect()
    if len(rows) > 4096:
        raise ValueError(
            "_pq_assign: codebook exceeds the 4096-row driver-side "
            "bound; shard the quantizer instead"
        )
    by_s: dict[int, list] = {}
    for r in rows:
        by_s.setdefault(r["s"], []).append((r["j"], r["__cent"]))
    cb = {
        s: (
            np.asarray([j for j, _ in sorted(ent)], dtype=np.int32),
            np.stack([np.asarray(c, float) for _, c in sorted(ent)]),
        )
        for s, ent in by_s.items()
    }

    @pandas_udf("int")
    def _code(ps, psv):
        out = np.full(len(ps), -1, dtype=np.int32)
        sval = ps.to_numpy()
        for s, (jids, C) in cb.items():
            mask = sval == s
            if not mask.any():
                continue
            A = np.stack([np.asarray(v, float) for v in psv[mask]])
            n, d = A.shape
            aa = np.zeros(n)
            bb = np.zeros(C.shape[0])
            ab = np.zeros((n, C.shape[0]))
            for i in range(d):
                ca = A[:, i]
                cc = C[:, i]
                aa += ca * ca
                bb += cc * cc
                ab += ca[:, None] * cc[None, :]
            d2 = (aa[:, None] - 2.0 * ab) + bb[None, :]
            out[mask] = jids[np.argmin(d2, axis=1)]
        return pd.Series(out)

    ids = [id_name] if isinstance(id_name, str) else list(id_name)
    # asNondeterministic: deterministic kernel, but the code column
    # feeds joins downstream and the inferred isnotnull(code) filter
    # was pushed below this projection, re-running the full PQ
    # encoding kernel once per row before the real evaluation (two
    # `_code` ArrowEvalPython nodes per occurrence in the r7
    # s_pq_recall plan, plans/r08). Guide §4.4; values unchanged.
    return subs.select(
        *ids, "s", _code.asNondeterministic()(F.col("s"), F.col("sv")).alias("code")
    )


def pq_codebooks(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    ksub: int = 8,
    sub_dim: int = 16,
    iters: int = 1,
) -> DataFrame:
    """Product-quantization codebooks (Jégou, Douze & Schmid, TPAMI
    2011): each of the ``m`` sub-spaces gets its own ``ksub``-centroid
    k-means, trained with the repo's deterministic recipe — seeds are
    the sub-vectors of the ``ksub`` lowest-id corpus rows, refined by
    ``iters`` Lloyd steps whose per-dimension means round to 9
    decimals (above double-ulp, below signal) so Spark's and DuckDB's
    partial-sum orders agree bitwise. Raw (unnormalized) vectors:
    PQ approximates L2, not cosine.

    Returns (s, j, __cent). With fresh (pairwise-distinct) seed
    sub-vectors and ``iters ≤ 1``, every seed assigns to itself at
    distance 0 so all ksub codes survive the Lloyd step; duplicate
    seed sub-vectors, or later iterations (centroids have moved), can
    leave a code with zero members, and that (s, j) row then drops
    from the codebook — deterministically on both engines, but
    callers doing bits-per-vector accounting should count the
    returned rows, not assume m·ksub.
    """
    vecs = corpus.select(
        F.col(id_col).alias("__id"), as_double_array(vec_col).alias("__v")
    )
    subs = _subvectors(vecs, "__id", F.col("__v"), m, sub_dim)
    wseed = Window.partitionBy("s").orderBy("__id")
    cents = (
        _subvectors(
            vecs.orderBy("__id").limit(ksub), "__id", F.col("__v"), m, sub_dim
        )
        .withColumn("j", F.row_number().over(wseed) - 1)
        .select("s", "j", F.col("sv").alias("__cent"))
    )
    for _ in range(iters):
        assign = _pq_assign(subs, cents, "__id")
        cents = (
            subs.join(assign, ["__id", "s"])
            .select("s", F.col("code").alias("j"), F.posexplode("sv").alias("pos", "val"))
            .groupBy("s", "j", "pos")
            .agg(F.round(F.avg("val"), 9).alias("val"))
            .groupBy("s", "j")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "val"))),
                    lambda st: st["val"],
                ).alias("__cent")
            )
        )
    # materialize (m·ksub rows) locally: consumers collect the
    # codebook anyway and would otherwise re-run the Lloyd lineage
    rows = sorted(
        ((r["s"], r["j"], r["__cent"]) for r in cents.collect()),
        key=lambda t: (t[0], t[1]),
    )
    return corpus.sparkSession.createDataFrame(
        rows, "s int, j int, __cent array<double>"
    )


def pq_codebooks_sharded(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    ksub: int = 8,
    sub_dim: int = 16,
    n_shards: int = 2,
    iters: int = 1,
) -> DataFrame:
    """MERGE-able PQ index build: train an independent ``ksub``-code
    codebook per data shard (``id % n_shards``) and merge by CODEBOOK
    UNION — shard sh's code ``j`` becomes ``sh·ksub + j``. Shards
    never exchange data during training (the same embarrassing
    parallelism as the sketch merges: each shard's Lloyd step sees
    only its own rows), and the merged book is a plain union; the one
    corpus-wide pass is the re-assignment every codebook build needs
    anyway (map-only). The result is a valid (m, n_shards·ksub)
    codebook — recall vs the same-budget global book is measured in
    ``s_pq_shard_merge_recall``. Returns (s, j, __cent) local rows,
    exchangeable with ``pq_codebooks`` output."""
    books = []
    for sh in range(n_shards):
        shard = corpus.where(
            F.pmod(F.col(id_col), F.lit(n_shards)) == sh
        )
        cb = pq_codebooks(
            shard, id_col, vec_col, m, ksub, sub_dim, iters
        )
        books.append(
            cb.select(
                "s", (F.col("j") + sh * ksub).alias("j"), "__cent"
            )
        )
    merged = books[0]
    for b in books[1:]:
        merged = merged.unionByName(b)
    return merged


def pq_encode(
    corpus: DataFrame,
    cents: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    sub_dim: int = 16,
) -> DataFrame:
    """Encode the corpus against a prebuilt PQ codebook: the
    (neighbor_id, s, code) table every ADC consumer scores against —
    one broadcast join + deterministic nearest-code pick per
    subvector, m codes/vector. This is the stored-index artifact of
    a PQ deployment; factoring it out lets harnesses build it once
    and pass it to ``pq_adc_topk(codes=...)``."""
    cvecs = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double_array(vec_col).alias("__v"),
    )
    return _pq_assign(
        _subvectors(cvecs, "neighbor_id", F.col("__v"), m, sub_dim),
        cents,
        "neighbor_id",
    )


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    m: int = 4,
    ksub: int = 8,
    sub_dim: int = 16,
    iters: int = 1,
    round_to: int = 6,
    cents: DataFrame | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: the corpus is
    compressed to ``m`` one-byte codes per vector; each query builds
    an exact (s, j) distance table against the codebooks and the
    approximate distance is the fixed-order sum of its ``m`` table
    lookups.

    The 100 TB plan — the reason PQ exists: corpus vectors are read
    ONCE to encode (map-only after a broadcast of the m·ksub
    codebook); at query time only the m-codes table (32 bytes/vector
    here vs 512 for raw floats) is scanned, the per-query distance
    table is broadcast-sized (queries·m·ksub rows), and scoring is
    one broadcast join + partial agg — linear in the corpus, never a
    corpus self-join. The fixed-order sum (term s0..s3 pivoted into
    columns, added left-to-right) keeps the float result
    engine-portable where a shuffled float SUM would not be.

    Returns (query_id, neighbor_id, approx_dist, rank). Pass
    ``cents`` to score against a prebuilt codebook (e.g. the
    shard-merged one from ``pq_codebooks_sharded``), and ``codes``
    to score against an already-encoded corpus (the (id, s, code)
    table ``_pq_assign`` produces for that codebook) — the
    production shape, where the encoded corpus is a stored artifact
    and only queries are scored fresh.
    """
    if cents is None:
        cents = pq_codebooks(
            corpus, id_col, vec_col, m, ksub, sub_dim, iters
        )
    if codes is None:
        # single encode path — keep in lockstep with pq_encode so the
        # inline branch cannot drift from the factored artifact build
        codes = pq_encode(corpus, cents, id_col, vec_col, m, sub_dim)
    qvecs = queries.select(
        F.col(id_col).alias("query_id"), as_double_array(vec_col).alias("__v")
    )
    qdist = (
        _subvectors(qvecs, "query_id", F.col("__v"), m, sub_dim)
        .join(F.broadcast(cents), "s")
        .select(
            "query_id",
            "s",
            "j",
            l2sq(F.col("sv"), F.col("__cent")).alias("__d2"),
        )
    )
    partial = codes.join(
        F.broadcast(qdist),
        (codes["s"] == qdist["s"]) & (codes["code"] == qdist["j"]),
    ).select("query_id", "neighbor_id", codes["s"].alias("s"), "__d2")
    terms = [
        F.sum(F.when(F.col("s") == s, F.col("__d2"))).alias(f"__t{s}")
        for s in range(m)
    ]
    total = F.col("__t0")
    for s in range(1, m):
        total = total + F.col(f"__t{s}")
    scored = (
        partial.groupBy("query_id", "neighbor_id")
        .agg(*terms)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(total, round_to).alias("approx_dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("approx_dist"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "approx_dist", "rank")
    )


def ivfpq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    m: int = 4,
    ksub: int = 8,
    sub_dim: int = 16,
    round_to: int = 6,
    layout_dir: str | None = None,
) -> DataFrame:
    """IVFADC (Jégou, Douze & Schmid, TPAMI 2011 §V): the full
    billion-scale ANN architecture — a coarse IVF quantizer routes
    vectors to cells, product quantization encodes each vector's
    RESIDUAL from its cell centroid, and queries probe ``nprobe``
    cells computing one ADC distance table per (query, cell) against
    the shared residual codebooks.

    The 100 TB plan: the corpus is scanned once to assign + encode
    (everything broadcast-joined, map-shaped); at query time the
    codes table is restricted to the probed cells by a broadcast
    semi-join BEFORE the ADC join — with ``layout_dir`` (codes
    persisted partitioned by cell, the §V inverted-list layout) that
    restriction is dynamic partition pruning, so only nprobe/n_cells
    of the compressed corpus is read at all (and the codes are m
    bytes, not the raw floats); the per-(query, cell) distance
    tables are queries·nprobe·m·ksub rows, broadcast. No stage is
    quadratic in the corpus, and residual encoding is what keeps PQ
    accurate once cells localize the vectors.

    Deterministic end-to-end by the repo's recipe (lowest-id seeds,
    round-9 Lloyd means, fold-order float ops, fixed-order ADC sum,
    ties to smaller ids/cells). Unit-sphere domain: vectors are
    L2-normalized before coarse assignment, so ADC approximates the
    unit-vector L2 distance (monotone in cosine).

    Returns (query_id, neighbor_id, approx_dist, rank).
    """
    cent, cb, codes = ivfpq_index(
        corpus, id_col, vec_col, n_cells, m, ksub, sub_dim,
        layout_dir=layout_dir,
    )
    return ivfpq_query(
        cent, cb, codes, queries, id_col, vec_col, k, nprobe, m,
        sub_dim, round_to,
    )


def ivfpq_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    m: int = 4,
    ksub: int = 8,
    sub_dim: int = 16,
    layout_dir: str | None = None,
):
    """Build the IVFADC index once: coarse centroids, residual
    codebooks, and per-vector (cell, m codes). Returns (cent, cb,
    codes) — the tables a production index build persists; callers
    can score any number of query batches / nprobe settings against
    them without re-encoding the corpus.

    ``layout_dir``: persist the codes table partitioned by ``cell``
    (the on-disk inverted-list layout) and return the read-back
    DataFrame, so the query path's probed-cell restriction becomes
    PHYSICAL partition pruning instead of a post-scan filter."""
    cent = ivf_centroids(corpus, id_col, vec_col, n_cells, iters=1)

    cvec = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _unit(as_double_array(vec_col)).alias("__uv"),
    )
    # the residual table is the INDEX — every later stage (codebook
    # training, encoding, ADC) re-reads it, so materialize once
    # instead of re-running the assignment kernel per consumer
    # (measured 5 evaluations otherwise). At cluster scale this is
    # the table an index build persists anyway. The cell assignment
    # rides the corpus rows in-map (attach_cells), so no
    # corpus⋈cellmap join is ever paid.
    res = (
        attach_cells(cvec, cent)
        .join(F.broadcast(cent), "cell")
        .select(
            "neighbor_id",
            "cell",
            F.zip_with(
                F.col("__uv"), F.col("__cent"), lambda x, y: x - y
            ).alias("__r"),
        )
        .localCheckpoint(eager=False)
    )
    cb = pq_codebooks(res, "neighbor_id", "__r", m, ksub, sub_dim, iters=1)
    # carry cell through encoding (composite key) so ADC needs no
    # second corpus-sized join to recover it
    codes = _pq_assign(
        _subvectors(res, ["neighbor_id", "cell"], F.col("__r"), m, sub_dim),
        cb,
        ["neighbor_id", "cell"],
    )
    if layout_dir is not None:
        # Persist the inverted lists AT REST partitioned by cell —
        # the IVFADC §V layout. A probed-cell restriction then prunes
        # whole directories out of the scan (asserted in
        # tests/test_plan_hygiene.py), so nprobe/n_cells of the codes
        # are READ, not just filtered — the saving the architecture
        # promises at 100 TB.
        spark = codes.sparkSession
        cols = codes.columns
        cell_type = codes.schema["cell"].dataType
        codes.write.mode("overwrite").partitionBy("cell").parquet(
            layout_dir
        )
        codes = (
            spark.read.parquet(layout_dir)
            # partition-dir inference types cell as int; restore the
            # build-side type so downstream joins stay equi on equal
            # types
            .withColumn("cell", F.col("cell").cast(cell_type))
            .select(*cols)
        )
    return cent, cb, codes


def ivfpq_encode(
    cent: DataFrame,
    cb: DataFrame,
    delta: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    sub_dim: int = 16,
) -> DataFrame:
    """Encode NEW vectors against a prebuilt IVFADC index (see
    ``ivfpq_index``) — index maintenance without retraining: each
    delta vector is assigned to its nearest existing coarse cell
    (in-map Arrow kernel, no join), its residual is quantized with
    the EXISTING per-subspace codebooks, and the resulting
    (id, cell, m codes) rows union straight into the stored codes
    table. Map-only + one broadcast of the (tiny) centroid/codebook
    tables, so ingest cost is linear in the delta alone — the corpus
    is never touched, which is what keeps a 100 TB index fresh
    between (rare) retrains."""
    cvec = delta.select(
        F.col(id_col).alias("neighbor_id"),
        _unit(as_double_array(vec_col)).alias("__uv"),
    )
    res = (
        attach_cells(cvec, cent)
        .join(F.broadcast(cent), "cell")
        .select(
            "neighbor_id",
            "cell",
            F.zip_with(
                F.col("__uv"), F.col("__cent"), lambda x, y: x - y
            ).alias("__r"),
        )
    )
    return _pq_assign(
        _subvectors(res, ["neighbor_id", "cell"], F.col("__r"), m, sub_dim),
        cb,
        ["neighbor_id", "cell"],
    )


def ivfpq_query(
    cent: DataFrame,
    cb: DataFrame,
    codes: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 4,
    m: int = 4,
    sub_dim: int = 16,
    round_to: int = 6,
) -> DataFrame:
    """Score a query batch against a prebuilt IVFADC index (see
    ``ivfpq_index``); ``nprobe`` is the probed-cell knob."""
    qvec = queries.select(
        F.col(id_col).alias("query_id"),
        _unit(as_double_array(vec_col)).alias("__uv"),
    )
    qscored = qvec.crossJoin(F.broadcast(cent)).withColumn(
        "__s", dot(F.col("__uv"), F.col("__cent"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("__s"), F.asc("cell"))
    qprobe = (
        qscored.withColumn("__rn", F.row_number().over(wq))
        .where(F.col("__rn") <= nprobe)
        .select("query_id", "cell", "__cent")
    )
    qres = qprobe.join(qvec, "query_id").select(
        "query_id",
        "cell",
        F.zip_with(
            F.col("__uv"), F.col("__cent"), lambda x, y: x - y
        ).alias("__r"),
    )
    qdist = (
        _subvectors(qres, ["query_id", "cell"], F.col("__r"), m, sub_dim)
        .join(F.broadcast(cb), "s")
        .select(
            "query_id",
            "cell",
            "s",
            "j",
            l2sq(F.col("sv"), F.col("__cent")).alias("__d2"),
        )
    )
    # restrict the codes table to the PROBED cells before the ADC
    # join: a broadcast semi-join on the cell key (≤ queries×nprobe
    # distinct values). On an in-memory codes table this is a cheap
    # row filter; on a ``layout_dir`` table partitioned by cell it
    # becomes dynamic partition pruning — only the probed cells'
    # inverted lists are read at all.
    codes = codes.join(
        F.broadcast(qprobe.select("cell").distinct()), "cell", "left_semi"
    )
    coded = codes.withColumnRenamed("cell", "__ccell")
    joined = coded.join(
        F.broadcast(qdist),
        (coded["s"] == qdist["s"])
        & (coded["code"] == qdist["j"])
        & (coded["__ccell"] == qdist["cell"]),
    ).select("query_id", "neighbor_id", coded["s"].alias("s"), "__d2")
    terms = [
        F.sum(F.when(F.col("s") == s, F.col("__d2"))).alias(f"__t{s}")
        for s in range(m)
    ]
    total = F.col("__t0")
    for s in range(1, m):
        total = total + F.col(f"__t{s}")
    scored = (
        joined.groupBy("query_id", "neighbor_id")
        .agg(*terms)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(total, round_to).alias("approx_dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("approx_dist"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "approx_dist", "rank")
    )


def ivfpq_rerank_topk(
    cent: DataFrame,
    cb: DataFrame,
    codes: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    kprime: int = 25,
    nprobe: int = 4,
    m: int = 4,
    sub_dim: int = 16,
    round_to: int = 6,
    cand: DataFrame | None = None,
) -> DataFrame:
    """Residual re-ranking on top of ADC (the standard second stage
    of a compressed-vector retriever, Jégou TPAMI'11 §V.D): take the
    ADC top-``kprime`` candidates (cheap, code-width-bounded
    accuracy), then score ONLY those with exact unit-L2 distances
    and keep the top-``k``. Recall is then limited by whether the
    true neighbors survive the kprime cut, not by the 12-bit codes —
    measured lift on this corpus in ``s_ivfpq_rerank_recall``.

    Scale shape: the candidate table is queries×kprime rows
    (broadcast); the exact pass is one map-only broadcast join over
    the corpus — corpus vectors are touched once, no shuffle, no
    quadratic stage. Returns (query_id, neighbor_id, exact_d2,
    rank). Pass ``cand`` (a (query_id, neighbor_id) table equal to
    the ADC top-kprime) to re-rank a prebuilt candidate set instead
    of re-running the whole ADC scoring pipeline — the ``codes=``
    precedent one stage later."""
    if cand is None:
        cand = ivfpq_query(
            cent, cb, codes, queries, id_col, vec_col, kprime, nprobe,
            m, sub_dim, round_to,
        ).select("query_id", "neighbor_id")
    cvec = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _unit(as_double_array(vec_col)).alias("__cu"),
    )
    qvec = queries.select(
        F.col(id_col).alias("query_id"),
        _unit(as_double_array(vec_col)).alias("__qu"),
    )
    scored = (
        cvec.join(F.broadcast(cand), "neighbor_id")
        .join(F.broadcast(qvec), "query_id")
        .withColumn(
            "exact_d2",
            F.round(l2sq(F.col("__qu"), F.col("__cu")), round_to),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("exact_d2"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "exact_d2", "rank")
    )


def semdedup_prepped(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    iters: int = 1,
) -> DataFrame:
    """The SemDeDup clustering artifact: the corpus with its k-means
    cell attached — deterministic fit (``ivf_centroids`` recipe) +
    map-only nearest-cell assignment, returned as
    (id, __v double-array, cell). Factored out of ``semdedup`` so a
    caller can build it once and pass ``prepped_cells=``."""
    cent = ivf_centroids(corpus, id_col, vec_col, n_cells, iters)
    vecs = corpus.select(
        F.col(id_col).alias("__id"),
        _unit(as_double_array(vec_col)).alias("__uv"),
    )
    assign = _assign_cells(vecs, cent, "__id").withColumnRenamed(
        "__id", id_col
    )
    return corpus.select(
        F.col(id_col), as_double_array(vec_col).alias("__v")
    ).join(assign, id_col)


def semdedup(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    iters: int = 1,
    threshold: float = 0.95,
    round_to: int = 6,
    prepped_cells: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by k-means clustering + within-cluster cosine
    pruning. Embeddings are assigned to coarse k-means cells (the
    same deterministic quantizer as ``ivf_centroids``: lowest-id
    seeds, ``iters`` Lloyd steps, round-9 means); all-pairs cosine
    runs only WITHIN a cell; of every pair with rounded cosine ≥
    ``threshold`` the larger id is dropped (greedy keep-min-id, the
    standard deterministic stand-in for the paper's keep-one rule).

    Scale shape — the property that makes SemDeDup usable at 100 TB
    where raw near-dup search is not: the corpus never self-joins
    globally. Centroids are tiny and broadcast; assignment is
    map-only; the single shuffle partitions by cell; the within-cell
    Gram kernel (``blocked_cosine_pairs``) is quadratic only in the
    cell size, which the quantizer bounds at ≈ corpus/n_cells — grow
    ``n_cells`` with the corpus to hold cells constant.

    Returns (id, cell, dropped) for every corpus row.

    ``prepped_cells`` lets a caller supply the cell-assigned corpus
    (the ``semdedup_prepped`` output for the same corpus and knobs) —
    the stored clustering artifact — instead of refitting and
    re-assigning per call.
    """
    prepped = (
        prepped_cells
        if prepped_cells is not None
        else semdedup_prepped(corpus, id_col, vec_col, n_cells, iters)
    )
    # the prefilter margin must cover the caller's rounding step: a
    # raw cosine up to 0.5·10^-round_to BELOW the threshold still
    # rounds up to it, so it must survive the kernel's early cut
    pairs = blocked_cosine_pairs(
        prepped,
        id_col,
        "__v",
        "cell",
        threshold,
        margin=max(1e-6, 0.5 * 10.0 ** -round_to),
    )
    dropped = (
        pairs.withColumn("cosine_sim", F.round("cosine_raw", round_to))
        .where(F.col("cosine_sim") >= threshold)
        .select(F.col("b").alias(id_col))
        .distinct()
        .withColumn("__dropped", F.lit(True))
    )
    return prepped.join(dropped, id_col, "left").select(
        id_col,
        "cell",
        F.coalesce("__dropped", F.lit(False)).alias("dropped"),
    )


def blocked_cosine_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    threshold: float = 0.9,
    margin: float = 1e-6,
) -> DataFrame:
    """All-pairs cosine within each block, vectorized: one
    ``applyInPandas`` per block builds the block's Gram matrix with a
    dimension-major accumulation loop — the SAME left-to-right float
    order as the ``aggregate``/``zip_with`` column form, so results
    are bit-identical to the scalar path — and emits only pairs with
    unrounded cosine ≥ ``threshold − margin``. The caller applies the
    exact round + threshold JVM-side; the margin guarantees no pair
    that would pass the exact test is dropped early.

    Scale shape: ONE shuffle (hash by block); per-pair work is a
    numpy matrix kernel instead of an interpreted per-element lambda
    (~20× on 64-dim blocks of 400); the joined-pairs intermediate
    (|block|² rows carrying two embedding arrays each) never
    materializes. Block size is the same bounded-group invariant as
    every per-station pandas island.
    """
    import numpy as np
    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"a {id_type}, b {id_type}, cosine_raw double"
    empty = pd.DataFrame({"a": [], "b": [], "cosine_raw": []})

    def per_block(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf[pdf[vec_col].notna()]
        # (a, b) orientation must match Spark's binary (UTF-8 byte-wise)
        # string '<' — pandas' default str sort is codepoint/locale
        # order, which diverges for non-ASCII ids. Sort string ids by
        # their encoded bytes instead.
        if pdf[id_col].dtype == object:
            pdf = pdf.iloc[
                pdf[id_col].map(
                    lambda s: s.encode("utf-8")
                    if isinstance(s, str)
                    else s
                ).argsort(kind="mergesort")
            ]
        else:
            pdf = pdf.sort_values(id_col)
        n = len(pdf)
        if n < 2:
            return empty
        ids = pdf[id_col].to_numpy()
        A = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        gram = np.zeros((n, n))
        sq = np.zeros(n)
        for d in range(A.shape[1]):
            c = A[:, d]
            gram += np.outer(c, c)
            sq += c * c
        nrm = np.sqrt(sq)
        cos = gram / np.outer(nrm, nrm)
        iu, ju = np.triu_indices(n, k=1)
        vals = cos[iu, ju]
        keep = vals >= threshold - margin
        return pd.DataFrame(
            {
                "a": ids[iu[keep]],
                "b": ids[ju[keep]],
                "cosine_raw": vals[keep],
            }
        )

    # null blocks never pair (matches an inner equi-join on the block
    # key); grouping additionally on the vector length keeps ragged
    # inputs from crossing — a mixed-length pair's cosine was NULL in
    # the scalar zip_with form and filtered, so skipping it is
    # output-equivalent and lets np.stack assume a rectangle
    return (
        df.select(F.col(id_col), F.col(block_col), F.col(vec_col))
        .where(F.col(block_col).isNotNull())
        .groupBy(F.col(block_col), F.size(vec_col).alias("__dim"))
        .applyInPandas(per_block, out_schema)
    )
