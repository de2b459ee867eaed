"""[EXT] E3/E6 — similarity-search operators (SURVEY.md §2.11).

E3: nearest-neighbor search over an embedding column (array<float>).
Two paths, mirroring production ANN architecture:

- ``brute_force_topk`` — exact cosine top-k. The dot product is a
  higher-order zip_with/aggregate over the arrays (JVM, codegen) in
  strict index order, so Spark and DuckDB agree bit-for-bit on doubles.
  Query set x corpus is a broadcast nested-loop by construction — correct
  as the rerank stage over a candidate set, quadratic if abused as the
  full search at scale.
- ``lsh_bucket_topk`` — random-hyperplane (sign) LSH: bucket on the
  sign-bit signature, generate candidates per bucket, exact-rerank.
  The hyperplanes are derived from a hash-seeded deterministic stream
  (replay-stable, no RNG state to ship). This is the 100 TB path: one
  bounded-fan-out explode + one shuffle on (table, signature).

E6: time-series similarity over the events stream — per-entity hourly
profiles compared with Manhattan distance computed entirely in DECIMAL
(exact, order-independent) so the oracle matches bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

DEC = "decimal(38,6)"


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a, b):
    """Cosine similarity of two array<float> columns, evaluated in strict
    index order (deterministic across engines)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def unit_vector(vec):
    """vec scaled to unit L2 norm (doubles). Pair-scoring stages normalize
    each side ONCE — O(corpus x dim) — so the per-pair cosine collapses to
    a single dot pass instead of dot+two norms, i.e. 3x fewer interpreted
    higher-order-function evals on the O(pairs) hot path (measured
    3.8s -> 1.5s on the 125k-pair neardup at sf0.01).

    Zero-vector convention (repo-wide, mirrored by ``_unit_rows``): an
    all-zeros vector STAYS all-zeros — cosine 0 to everything, so it
    never passes a positive threshold and ranks below every real match
    with deterministic id tie-breaks. Dividing by the zero norm instead
    would raise DIVIDE_BY_ZERO under ANSI mode (Spark 4's default) the
    first time a real corpus ships an empty-doc/failed-encoder vector —
    at 100 TB they DO happen. ``try_divide`` yields NULL on the zero
    norm, coalesced to a 0.0 scale.

    Shape note: the reciprocal norm is bound ONCE PER ROW by
    materializing it through ``array_repeat`` and multiplying with
    ``zip_with`` — referencing the ``_norm`` aggregate inside a
    ``transform`` lambda re-evaluates it per ELEMENT (O(dim²)/row;
    measured 1.6 s → 1.2 s on the sf0.1 IVF-PQ build headline)."""
    inv = F.coalesce(F.try_divide(F.lit(1.0), _norm(vec)), F.lit(0.0))
    return F.zip_with(
        vec,
        F.array_repeat(inv, F.size(vec)),
        lambda x, i: x.cast("double") * i,
    )


def _unit_rows(m: "np.ndarray") -> "np.ndarray":
    """Row-normalize a (rows, dim) matrix to unit L2 length with the
    ``unit_vector`` zero-vector convention: a zero-norm row stays
    all-zeros (cosine 0 to everything) instead of dividing to NaN. Every
    Arrow-batch scoring/encoding kernel normalizes through this helper so
    the convention cannot drift between the JVM and numpy paths."""
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.where(norms == 0.0, 1.0, norms)


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """E3 exact path — top-k cosine neighbors of each query vector.

    Canonical distributed brute-force kNN: the (broadcast-sized by
    contract) query set rides to every executor as a broadcast variable;
    each Arrow batch of the corpus is scored with ONE numpy matmul and
    reduced to its local top-(k+1) per query before anything is emitted,
    so the shuffle carries O(batches x queries x k) rows instead of
    O(corpus x queries); a final window picks the global top-k. This is
    both the scale shape (local reduce before the exchange) and ~10x
    faster per pair than interpreted zip_with/aggregate dots at sf0.1.

    Local/global ordering is the same total order (cos desc, neighbor_id
    asc), so the global winners are contained in the union of local
    winners — exact, not approximate; k+1 locally because the self pair
    (cos=1) is removed after the reduce. numpy float64 sums round
    differently than the oracle's sequential loop (~1e-15 noise); rank
    output is stable because the fixtures' smallest adjacent top-k gap is
    ~1e-5 (measured at sf0.01 and sf0.1), 10 orders of magnitude wider.

    Returns (query_id, neighbor_id, rank). Ranks break ties on neighbor
    id, so the result set is deterministic.
    """
    q_rows = queries.select(id_col, vec_col).collect()  # broadcast-sized
    if not q_rows:
        return embeddings.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, rank int"
        )
    qids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Q = np.vstack([np.asarray(r[1], dtype=np.float64) for r in q_rows])
    Q = _unit_rows(Q)
    bc = embeddings.sparkSession.sparkContext.broadcast((qids, Q))
    take = k + 1

    def score(batches):
        b_qids, b_q = bc.value
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            c = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            c = _unit_rows(c)
            sims = c @ b_q.T  # (batch, n_queries)
            out_q, out_n, out_s = [], [], []
            for j in range(len(b_qids)):
                order = np.lexsort((ids, -sims[:, j]))[:take]
                out_q.append(np.full(len(order), b_qids[j]))
                out_n.append(ids[order])
                out_s.append(sims[order, j])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "cos_sim": np.concatenate(out_s),
                }
            )

    local = embeddings.select(id_col, vec_col).mapInPandas(
        score, "query_id long, neighbor_id long, cos_sim double"
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        local.filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def filtered_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    filter_col: str = "label",
) -> DataFrame:
    """E3 filtered search — exact top-k cosine neighbors restricted to
    corpus rows whose ``filter_col`` EQUALS the query's (the
    pgvector/Qdrant "filtered ANN" shape: retrieval within a domain,
    dedup within a language, same-tenant search). Filter-THEN-search:
    the predicate prunes candidates before any scoring, never a
    post-filter of an unfiltered top-k (which under-fills k whenever
    the filter is selective).

    Scale shape is ``brute_force_topk``'s: the broadcast-sized query
    set (ids, vectors, filter values) rides to every executor; each
    Arrow batch of the corpus is bucketed by filter value once, each
    query group scores only its matching slice with one numpy matmul,
    and only local top-(k+1) rows leave the executor, so the shuffle
    carries O(batches x queries x k). SQL equality semantics: a NULL
    filter value matches nothing on either side. Returns (query_id,
    neighbor_id, rank) with the same deterministic ordering contract
    as the exact path."""
    q_rows = queries.select(id_col, vec_col, filter_col).collect()
    q_rows = [r for r in q_rows if r[2] is not None]
    if not q_rows:
        return embeddings.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, rank int"
        )
    by_val: dict = {}
    for r in q_rows:
        by_val.setdefault(r[2], []).append(r)
    groups = []
    for val, rows in by_val.items():
        gq = np.array([r[0] for r in rows], dtype=np.int64)
        gv = np.vstack([np.asarray(r[1], dtype=np.float64) for r in rows])
        gv = _unit_rows(gv)
        groups.append((val, gq, gv))
    bc = embeddings.sparkSession.sparkContext.broadcast(groups)
    take = k + 1

    def score(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            fv = pdf[filter_col]
            out_q, out_n, out_s = [], [], []
            c_cache = None
            for val, b_qids, b_q in bc.value:
                mask = (fv == val).to_numpy(dtype=bool)
                if not mask.any():
                    continue
                if c_cache is None:
                    c_cache = np.vstack(
                        pdf[vec_col].to_numpy()
                    ).astype(np.float64)
                    c_cache = _unit_rows(c_cache)
                sub, subids = c_cache[mask], ids[mask]
                sims = sub @ b_q.T
                for j in range(len(b_qids)):
                    order = np.lexsort((subids, -sims[:, j]))[:take]
                    out_q.append(np.full(len(order), b_qids[j]))
                    out_n.append(subids[order])
                    out_s.append(sims[order, j])
            if out_q:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(out_q),
                        "neighbor_id": np.concatenate(out_n),
                        "cos_sim": np.concatenate(out_s),
                    }
                )

    local = embeddings.select(id_col, vec_col, filter_col).filter(
        F.col(filter_col).isNotNull()
    ).mapInPandas(score, "query_id long, neighbor_id long, cos_sim double")
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        local.filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def _hyperplane_values(plane_idx: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: component d = md5-derived
    value in [-1, 1). Computed driver-side (no RNG state to ship)."""
    import hashlib

    comps = []
    for d in range(dim):
        h = hashlib.md5(f"plane-{plane_idx}-dim-{d}".encode()).digest()
        comps.append(int.from_bytes(h[:8], "big", signed=True) / float(1 << 63))
    return comps


def lsh_bucket_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_tables: int = 16,
    bits_per_table: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """E3 scale path — multi-table random-hyperplane LSH + exact rerank.

    Standard L-tables-of-k-bits geometry: a corpus vector is a candidate
    for a query if they share the full k-bit sign signature in ANY of the
    L tables (P[candidate | angle θ] = 1-(1-(1-θ/π)^k)^L — more tables
    raise recall, more bits cut bucket sizes). Each side explodes to L
    rows (bounded fan-out), the join key is (table, bucket); exact cosine
    reranks the deduped candidates. One shuffle over L x corpus rows —
    still linear in corpus size, vs the brute-force crossJoin.

    The signature stage is an Arrow-vectorized Pandas UDF: all L*k plane
    dot products per vector are ONE numpy matmul per batch — the
    documented fast path for dense linear algebra (per-plane
    zip_with/aggregate expressions measured 8.7s vs ~1.5s at sf0.1 for
    the same 64-plane geometry). The rerank stays in exact JVM-side
    zip_with cosine, so candidate scoring is engine-deterministic.
    """
    from pyspark.sql.functions import pandas_udf

    planes = np.array(
        [
            _hyperplane_values(t * bits_per_table + i, dim)
            for t in range(num_tables)
            for i in range(bits_per_table)
        ]
    )  # (L*k, dim)
    weights = 1 << np.arange(bits_per_table)  # bucket = sum(bit_i << i)

    @pandas_udf("array<long>")
    def table_buckets(vecs: pd.Series) -> pd.Series:
        v = np.vstack(vecs.to_numpy()).astype(np.float64)  # (n, dim)
        bits = (v @ planes.T) >= 0  # (n, L*k) sign bits
        b = bits.reshape(len(v), num_tables, bits_per_table) @ weights  # (n, L)
        return pd.Series(list(b))

    def exploded(df, id_alias):
        # Rerank payload pre-normalized (cosine sign bits are scale
        # invariant, so bucketing uses the raw vector unchanged).
        return df.select(
            F.col(id_col).alias(id_alias),
            unit_vector(F.col(vec_col)).alias(id_alias[0] + "_vec"),
            F.posexplode(table_buckets(F.col(vec_col))).alias("tbl", "bucket"),
        )

    c = exploded(embeddings, "neighbor_id").withColumnRenamed("n_vec", "c_vec")
    q = exploded(queries, "query_id")
    cand = (
        F.broadcast(q)
        .join(c, ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "q_vec", "neighbor_id", "c_vec")
        .distinct()
        .withColumn("cos_sim", _dot(F.col("q_vec"), F.col("c_vec")))
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


# Quantizer-training sample budget (vectors). Training cost must not
# scale with the corpus: k-means needs only enough points to estimate
# k (or ksub) cell means, so production ANN systems train on a bounded
# sample and encode the full corpus distributed (FAISS trains IVF/PQ on
# ~max(10k, 256*k) points regardless of index size). 32768 x dim=64
# doubles = 16 MB of driver memory, and at the fixture scales the
# sample covers the whole corpus. Measured at sf10 (500k vectors): the
# full-corpus distributed Lloyd path costs ~8 corpus passes (two per
# round per quantizer, each shuffling a dim-exploded frame) = 76.6 s
# index build; the sampled path trains in one bounded top-k scan +
# driver numpy, leaving encode as the only corpus-scale pass.
DEFAULT_TRAIN_SAMPLE = 32768


def _hash_sample(
    embeddings: DataFrame,
    n: int,
    id_col: str,
    vec_col: str,
    normalize: bool = True,
) -> "np.ndarray | None":
    """Deterministic bounded training sample: the ``n`` corpus vectors
    with the smallest xxhash64(id) — the same replay-stable ordering the
    distributed Lloyd seeds use, so ``sample[:k]`` IS the seed set and a
    rebuild collects the identical sample (no RNG state). None if empty."""
    vec = unit_vector(F.col(vec_col)) if normalize else F.col(vec_col)
    rows = (
        embeddings.select(F.col(id_col).alias("_id"), vec.alias("u"))
        .orderBy(F.xxhash64(F.col("_id")), F.col("_id"))
        .limit(n)
        .select("u")
        .collect()
    )
    if not rows:
        return None
    return np.array([r["u"] for r in rows], dtype=np.float64)


def _lloyd_spherical(sample: "np.ndarray", k: int, iters: int) -> "np.ndarray":
    """Driver-side spherical k-means over a bounded sample — the same
    update rule as the distributed rounds in ``_centroid_matrix``
    (max-inner-product assignment, renormalized mean, empty cells keep
    their previous centroid), so switching the training backend changes
    only WHERE the arithmetic runs, not its semantics."""
    cent = sample[: min(k, len(sample))].copy()
    for _ in range(iters):
        cells = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            mask = cells == c
            if mask.any():
                m = sample[mask].mean(axis=0)
                norm = np.linalg.norm(m)
                if norm > 0:
                    cent[c] = m / norm
    return cent


def _lloyd_pq(sample: "np.ndarray", m: int, ksub: int, iters: int) -> "np.ndarray":
    """Driver-side PQ codebook training over a bounded sample — mirrors
    the distributed rounds in ``_pq_codebooks``: assignment via the
    shared ``_assign_codes`` (euclidean argmin), plain-mean update,
    empty (sub, code) cells keep their previous centroid."""
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    sub_dim = dim // m
    seed = sample[: min(ksub, len(sample))]
    books = np.stack(
        [seed[:, s * sub_dim : (s + 1) * sub_dim].copy() for s in range(m)]
    )
    for _ in range(iters):
        codes = _assign_codes(sample, books)
        for s in range(m):
            x = sample[:, s * sub_dim : (s + 1) * sub_dim]
            for c in range(books.shape[1]):
                mask = codes[:, s] == c
                if mask.any():
                    books[s, c] = x[mask].mean(axis=0)
    return books


def _centroid_matrix(embeddings: DataFrame, n_cells: int, lloyd_iters: int,
                     id_col: str, vec_col: str,
                     train_sample: "int | None" = DEFAULT_TRAIN_SAMPLE,
                     ) -> np.ndarray:
    """IVF coarse quantizer training — deterministic distributed k-means.

    Init: the n_cells corpus vectors with the smallest xxhash64(id) (a
    replay-stable pseudo-random sample; one top-k, no RNG state). Lloyd
    rounds run fully distributed: assignment is a vectorized numpy argmax
    against the broadcast centroid matrix (one matmul per Arrow batch),
    the mean-update is posexplode -> groupBy(cell, dim).avg — elementwise
    means as plain codegen'd aggregates. Only the k x dim centroid matrix
    ever reaches the driver (true-config-sized, per SURVEY §7 risk 7).

    Default path (``train_sample`` set): train on the bounded
    ``_hash_sample`` driver-side (``_lloyd_spherical`` — identical update
    rule) so training cost is corpus-size-independent; pass
    ``train_sample=None`` for the full-corpus distributed rounds.
    """
    from pyspark.sql.functions import pandas_udf

    if train_sample is not None:
        sample = _hash_sample(embeddings, train_sample, id_col, vec_col)
        if sample is None:
            return None
        return _lloyd_spherical(sample, n_cells, lloyd_iters)

    unit = embeddings.select(
        F.col(id_col).alias("_id"), unit_vector(F.col(vec_col)).alias("u")
    )
    seeds = (
        unit.orderBy(F.xxhash64(F.col("_id")), F.col("_id"))
        .limit(n_cells)
        .select("u")
        .collect()
    )
    if not seeds:  # empty corpus — callers return an empty result frame
        return None
    cent = np.array([r["u"] for r in seeds], dtype=np.float64)  # (k, dim)

    for _ in range(lloyd_iters):
        # SNAPSHOT the centroids for the UDF closure — cent is mutated
        # in place by the update loop below, and only collect()'s eager
        # serialization keeps an aliased capture correct; a copy makes
        # the round's assignment independent of evaluation order (same
        # discipline as _pq_codebooks' books.copy())
        planes = cent.copy()

        @pandas_udf("int")
        def nearest_cell(vecs: pd.Series) -> pd.Series:
            v = np.vstack(vecs.to_numpy()).astype(np.float64)
            return pd.Series(np.argmax(v @ planes.T, axis=1).astype(np.int32))

        assigned = unit.select(nearest_cell(F.col("u")).alias("cell"), "u")
        means = (
            assigned.select("cell", F.posexplode("u").alias("dim", "x"))
            .groupBy("cell", "dim")
            .agg(F.avg("x").alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
            .select("cell", F.col("dm.m").alias("mean_vec"))
            .collect()
        )
        for r in means:  # empty cells keep their previous centroid
            m = np.array(r["mean_vec"], dtype=np.float64)
            norm = np.linalg.norm(m)
            if norm > 0:
                cent[r["cell"]] = m / norm
    return cent


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    lloyd_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample: "int | None" = DEFAULT_TRAIN_SAMPLE,
) -> DataFrame:
    """E3 scale path (IVF variant) — inverted-file ANN: train a coarse
    quantizer (deterministic k-means, `_centroid_matrix`), assign each
    corpus vector to its nearest centroid cell, probe the ``nprobe``
    closest cells per query, exact-rerank within the probed cells.

    Complements ``lsh_bucket_topk``: IVF adapts its partitions to the data
    distribution (better recall per candidate at a fixed budget), at the
    cost of a training pass; LSH is data-independent and purely streaming.
    Candidate volume ~= corpus x nprobe/n_cells — linear scan avoided, no
    crossJoin anywhere. The cell id is the shuffle key; cells are
    mildly skewed by construction (that is what makes IVF effective), and
    AQE skew-join splitting bounds the damage at scale.

    Returns (query_id, neighbor_id, rank) like the other E3 entries;
    recall vs brute force is pinned in tests/test_llm_ops.py.
    """
    from pyspark.sql.functions import pandas_udf

    cent = _centroid_matrix(embeddings, n_cells, lloyd_iters, id_col, vec_col,
                            train_sample)
    if cent is None:  # empty corpus
        return embeddings.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, rank int"
        )

    @pandas_udf("int")
    def nearest_cell(vecs: pd.Series) -> pd.Series:
        v = np.vstack(vecs.to_numpy()).astype(np.float64)
        return pd.Series(np.argmax(v @ cent.T, axis=1).astype(np.int32))

    @pandas_udf("array<int>")
    def probe_cells(vecs: pd.Series) -> pd.Series:
        v = np.vstack(vecs.to_numpy()).astype(np.float64)
        order = np.argsort(-(v @ cent.T), axis=1)[:, :nprobe].astype(np.int32)
        return pd.Series(list(order))

    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        unit_vector(F.col(vec_col)).alias("c_vec"),
    ).withColumn("cell", nearest_cell(F.col("c_vec")))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        unit_vector(F.col(vec_col)).alias("q_vec"),
    ).select("query_id", "q_vec", F.explode(probe_cells(F.col("q_vec"))).alias("cell"))

    cand = (
        F.broadcast(q)
        .join(c, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", _dot(F.col("q_vec"), F.col("c_vec")))
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def hourly_profiles(events: DataFrame) -> DataFrame:
    """E6 stage 1 — per-user hourly activity profile: exact DECIMAL sums
    of `value` per (user_id, hour bucket). One shuffle, partial-agg
    combined map-side."""
    bucket = F.date_trunc("hour", F.col("ts"))
    return events.groupBy(
        F.col("user_id"), bucket.alias("bucket")
    ).agg(F.sum(F.col("value").cast(DEC)).alias("hour_sum"))


def timeseries_similarity_topk(
    events: DataFrame,
    k: int = 3,
    max_users: int = 40,
) -> DataFrame:
    """E6 — nearest time-series per user: Manhattan distance between
    hourly-sum profiles, computed on the INNER join of the two users'
    buckets (hours where both are active — keeps distance exact-decimal
    and avoids densifying sparse profiles).

    Output (user_a, user_b, rank) for the k nearest neighbors of each
    user, ties broken by user_b. Scale shape: the bucket equi-join IS the
    candidate generator — an inverted time index where only pairs sharing
    an active hour ever materialize (co-activity-bounded, not all-pairs),
    shuffled on the bucket key with AQE absorbing popular-hour skew. At
    extreme scale, tighten candidates by raising the ``n_common`` floor
    or coarsening buckets before the join; ``max_users`` is only a
    test-scale cap. (A profile-vector LSH stage was evaluated and
    rejected: hour-of-day cosine recalls <0.35 of the exact
    Manhattan-on-common-hours top-3 on the fixture.)
    """
    # O(users x hours) rows — materialized so the two join sides and the
    # symmetrization don't each re-aggregate the events stream (left lazy
    # the plan scans events FOUR times: prof x2 via dist, dist x2 via the
    # union; checkpointed it scans once).
    prof = hourly_profiles(
        events.filter(F.col("user_id") < max_users)
    ).localCheckpoint(eager=True)
    a = prof.select(
        F.col("user_id").alias("user_a"),
        F.col("bucket"),
        F.col("hour_sum").alias("sum_a"),
    )
    b = prof.select(
        F.col("user_id").alias("user_b"),
        F.col("bucket"),
        F.col("hour_sum").alias("sum_b"),
    )
    dist = (
        a.join(b, "bucket")
        .filter(F.col("user_a") < F.col("user_b"))
        .groupBy("user_a", "user_b")
        .agg(
            F.sum(F.abs(F.col("sum_a") - F.col("sum_b"))).alias("dist"),
            F.count("*").alias("n_common"),
        )
        .filter(F.col("n_common") >= 3)
    ).localCheckpoint(eager=True)  # tiny; consumed twice by the union below
    sym = dist.select("user_a", "user_b", "dist").unionByName(
        dist.select(
            F.col("user_b").alias("user_a"),
            F.col("user_a").alias("user_b"),
            "dist",
        )
    )
    w = W.partitionBy("user_a").orderBy(F.col("dist").asc(), F.col("user_b").asc())
    return (
        sym.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("user_a", "user_b", "rank", F.col("dist").cast("double").alias("dist"))
    )


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.45,
    max_vecs: int = 500,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """E2 variant — embedding-cosine near-duplicate pairs: (vec_a, vec_b)
    with cosine(a, b) >= threshold.

    This is the EXACT verify form (broadcast nested-loop over a capped
    slice, quadratic — valid at test scale and as the verifier behind LSH
    candidates); the 100 TB candidate generator is
    ``embedding_neardup_lsh`` below (hyperplane bucketing with this
    cosine filter as the verify predicate).
    Output is id pairs only: ints are selection-stable across engines as
    long as no pair's cosine sits within float noise of the threshold
    (the fixture's closest gap is ~5e-4 vs ~1e-7 cross-engine noise).
    """
    e = embeddings.filter(F.col(id_col) < max_vecs)
    a = e.select(F.col(id_col).alias("vec_a"), unit_vector(F.col(vec_col)).alias("a_vec"))
    b = e.select(F.col(id_col).alias("vec_b"), unit_vector(F.col(vec_col)).alias("b_vec"))
    return (
        F.broadcast(a)
        .crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .filter(_dot(F.col("a_vec"), F.col("b_vec")) >= threshold)
        .select("vec_a", "vec_b")
    )


def embedding_neardup_lsh(
    embeddings: DataFrame,
    threshold: float = 0.45,
    num_tables: int = 16,
    bits_per_table: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """E2 (embedding scale path) — near-dup pairs with cosine >= threshold
    via random-hyperplane LSH SELF-join: each vector explodes to its L
    table buckets (one numpy matmul per Arrow batch for all L*k sign
    bits), candidates are generated per (table, bucket) with the same
    single-consumption collect_list expansion as the MinHash path (one
    shuffle, no signature re-materialization), and the exact JVM-side
    cosine verifies candidates only — precision 1.0 by construction,
    recall governed by the table geometry
    (P[candidate | cos s] = 1-(1-((1-acos(s)/pi))^k)^L, ~0.96 at s=0.45
    with 16x4; pinned against the exact pair set in pytest).

    Linear in corpus size — no crossJoin anywhere; the verify re-reads
    only vectors that appear in some candidate pair (broadcast semi-join
    prune, lazy-checkpointed candidates as in minhash_neardup_pairs).
    """
    from pyspark.sql.functions import pandas_udf

    planes = np.array(
        [
            _hyperplane_values(t * bits_per_table + i, dim)
            for t in range(num_tables)
            for i in range(bits_per_table)
        ]
    )
    weights = 1 << np.arange(bits_per_table)

    @pandas_udf("array<long>")
    def table_buckets(vecs: pd.Series) -> pd.Series:
        v = np.vstack(vecs.to_numpy()).astype(np.float64)
        bits = (v @ planes.T) >= 0
        b = bits.reshape(len(v), num_tables, bits_per_table) @ weights
        return pd.Series(list(b))

    banded = embeddings.select(
        F.col(id_col).alias("vid"),
        F.posexplode(table_buckets(F.col(vec_col))).alias("tbl", "bucket"),
    )
    buckets = (
        banded.groupBy("tbl", "bucket")
        .agg(F.collect_list("vid").alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    pairs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x: F.transform(
                F.filter(F.col("ids"), lambda y: y > x),
                lambda y: F.struct(x.alias("vec_a"), y.alias("vec_b")),
            ),
        )
    )
    cand = (
        buckets.select(F.explode(pairs).alias("p"))
        .select("p.vec_a", "p.vec_b")
        .distinct()
        .localCheckpoint(eager=False)
    )
    needed = (
        cand.select(F.col("vec_a").alias(id_col))
        .union(cand.select(F.col("vec_b").alias(id_col)))
        .distinct()
    )
    pruned = embeddings.join(F.broadcast(needed), id_col, "left_semi")
    a = pruned.select(
        F.col(id_col).alias("vec_a"), unit_vector(F.col(vec_col)).alias("a_vec")
    )
    b = pruned.select(
        F.col(id_col).alias("vec_b"), unit_vector(F.col(vec_col)).alias("b_vec")
    )
    return (
        cand.join(a, "vec_a")
        .join(b, "vec_b")
        .filter(_dot(F.col("a_vec"), F.col("b_vec")) >= threshold)
        .select("vec_a", "vec_b")
    )


def _cell_assignment(
    embeddings: DataFrame,
    cent: "np.ndarray",
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, unit vector, nearest cell, cosine to that cell's centroid) —
    one Arrow-batched numpy matmul per batch, no shuffle."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<cell:int, cent_sim:double>")
    def nearest(vecs: pd.Series) -> pd.DataFrame:
        v = np.vstack(vecs.to_numpy()).astype(np.float64)
        sims = v @ cent.T
        cell = np.argmax(sims, axis=1)
        return pd.DataFrame(
            {
                "cell": cell.astype(np.int32),
                "cent_sim": sims[np.arange(len(v)), cell],
            }
        )

    return (
        embeddings.select(
            F.col(id_col).alias("vid"),
            unit_vector(F.col(vec_col)).alias("uvec"),
        )
        .withColumn("a", nearest(F.col("uvec")))
        .select("vid", "uvec", "a.cell", "a.cent_sim")
    )


#: Audit of the LAST SemDeDup candidate stage on this driver:
#: {"cells_truncated": int, "members_dropped": int}. Rebound atomically
#: (never mutated in place) by ``_pairs_from_cells``; a non-zero count
#: means ``max_cell`` clipped candidate generation (recall loss) and
#: ``n_cells`` is undersized for the corpus — the same "no silent caps"
#: discipline as the minhash / simhash ``max_bucket`` caps. This is a
#: last-call diagnostic only: concurrent dedup runs on one driver each
#: publish a complete dict but only the latest survives — a caller who
#: needs race-free counts passes its own ``audit=`` dict to
#: ``semantic_dedup_pairs``/``semantic_dedup`` instead.
LAST_SEMDEDUP_TRUNCATION: dict = {"cells_truncated": 0, "members_dropped": 0}

#: Auto-sizing target for ``n_cells=None``: the paper's n_cells ∝ corpus
#: discipline with ~this many vectors per cell.
SEMDEDUP_TARGET_CELL_SIZE = 512


def _auto_n_cells(embeddings: DataFrame, target_cell_size: int) -> int:
    """n_cells from the corpus count — ``max(1, n // target_cell_size)``
    (SemDeDup's n_cells ∝ corpus size as the DEFAULT, so the quadratic
    in-cell work stays bounded without a manually re-tuned knob). One
    O(1)-output count job."""
    n = embeddings.count()
    return max(1, n // target_cell_size)


def semantic_dedup_pairs(
    embeddings: DataFrame,
    eps: float = 0.45,
    n_cells: "int | None" = 64,
    lloyd_iters: int = 8,
    max_cell: int = 4000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample: "int | None" = DEFAULT_TRAIN_SAMPLE,
    audit: "dict | None" = None,
    centroids: "np.ndarray | None" = None,
) -> DataFrame:
    """E2 (SemDeDup candidate stage) — within-cluster semantic near-dup
    pairs: cosine(a, b) >= eps, where candidates are generated ONLY
    inside k-means cells (Abbas et al. 2023, "SemDeDup" — cluster the
    corpus, search duplicates within clusters). The cluster count is the
    scale knob: with n_cells ∝ corpus size the per-cell work stays
    bounded and total candidate volume is ~n·(n/k) instead of n², while
    true semantic duplicates (cosine near 1) virtually always share a
    nearest centroid. ``n_cells=1`` degenerates to the exact all-pairs
    form — the oracle/ground-truth twin.

    Same single-shuffle shape as the LSH/minhash candidate stages: one
    groupBy on the cell id, in-cell pairs via the collect_list
    expansion, exact JVM-side cosine as the verify predicate (precision
    1.0 by construction). Cells larger than ``max_cell`` are truncated
    to their ``max_cell`` smallest ids (quadratic-corner guard, same
    discipline as the simhash/minhash ``max_bucket`` caps — a cell that
    big means n_cells is undersized for the corpus; raise it). The cap
    is NOT silent: truncated-cell and dropped-member counts are logged
    and recorded in ``LAST_SEMDEDUP_TRUNCATION`` (last-call diagnostic;
    pass ``audit={}`` to receive the counts race-free for THIS call —
    concurrent dedup runs on one driver share the global). ``n_cells=None``
    auto-sizes from the corpus count (one count job;
    ``SEMDEDUP_TARGET_CELL_SIZE`` vectors per cell) so the paper's
    n_cells ∝ corpus discipline is the default rather than a manual
    knob whose mis-set failure mode is invisible.

    ``centroids`` (optional) supplies an externally-trained FROZEN
    quantizer instead of training here — the incremental maintenance
    twin (``streaming/semdedup.py``) freezes one at first ingest and
    passes the same matrix to this one-shot form for its equality
    pin."""
    if centroids is not None:
        cent = centroids
    else:
        if n_cells is None:
            n_cells = _auto_n_cells(embeddings, SEMDEDUP_TARGET_CELL_SIZE)
        cent = _centroid_matrix(
            embeddings, n_cells, lloyd_iters, id_col, vec_col, train_sample
        )
    if cent is None:
        return embeddings.sparkSession.createDataFrame(
            [], "vec_a long, vec_b long"
        )
    assigned = _cell_assignment(embeddings, cent, id_col, vec_col)
    return _pairs_from_cells(assigned, eps, max_cell, audit)


def _pairs_from_cells(
    assigned: DataFrame, eps: float, max_cell: int, audit: "dict | None" = None
) -> DataFrame:
    """In-cell pair generation + exact cosine verify over a
    ``_cell_assignment`` frame (shared by the pair and dedup entry
    points so the quantizer trains once). Surfaces the ``max_cell``
    cap: cells over the cap are clipped to their smallest ids AND
    counted — the counts land in the caller's ``audit`` dict (the
    race-free per-call channel), in ``LAST_SEMDEDUP_TRUNCATION``
    (last-call diagnostic, rebound atomically), and in a
    ``logging.warning``, because a clipped cell silently costs recall
    and means n_cells is undersized for the corpus. The pre-clip cell
    frame is lazily checkpointed so the audit aggregate and the pair
    pipeline share one groupBy shuffle; the aggregate's eager driver
    job is skipped entirely when no ``audit`` dict was passed AND the
    module logger has WARNING disabled — the one case where nobody can
    observe the counts."""
    import logging

    logger = logging.getLogger(__name__)
    pre = (
        assigned.groupBy("cell")
        .agg(F.sort_array(F.collect_list("vid")).alias("ids"))
        .localCheckpoint(eager=False)
    )
    if audit is not None or logger.isEnabledFor(logging.WARNING):
        row = pre.agg(
            F.sum(
                F.when(F.size("ids") > max_cell, 1).otherwise(0)
            ).alias("cells"),
            F.sum(
                F.when(
                    F.size("ids") > max_cell, F.size("ids") - max_cell
                ).otherwise(0)
            ).alias("members"),
        ).collect()[0]
        counts = {
            "cells_truncated": int(row["cells"] or 0),
            "members_dropped": int(row["members"] or 0),
        }
        if audit is not None:
            audit.update(counts)
        globals()["LAST_SEMDEDUP_TRUNCATION"] = counts
        if counts["cells_truncated"]:
            logger.warning(
                "semantic_dedup: max_cell=%d truncated %d cell(s), dropping "
                "%d member(s) from candidate generation — recall is degraded; "
                "raise n_cells (or pass n_cells=None to auto-size)",
                max_cell,
                counts["cells_truncated"],
                counts["members_dropped"],
            )
    else:
        # aggregate skipped (nobody can observe the counts this call):
        # rebind the last-call diagnostic to an explicit unknown so a
        # later module-attribute reader can't mistake a PREVIOUS call's
        # counts for this one's (ADVICE r8)
        globals()["LAST_SEMDEDUP_TRUNCATION"] = {
            "cells_truncated": None,
            "members_dropped": None,
        }
    cells = (
        pre.withColumn("ids", F.slice(F.col("ids"), 1, max_cell))
        .filter(F.size("ids") >= 2)
    )
    pairs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x: F.transform(
                F.filter(F.col("ids"), lambda y: y > x),
                lambda y: F.struct(x.alias("vec_a"), y.alias("vec_b")),
            ),
        )
    )
    cand = (
        cells.select(F.explode(pairs).alias("p"))
        .select("p.vec_a", "p.vec_b")
        .localCheckpoint(eager=False)
    )
    a = assigned.select(F.col("vid").alias("vec_a"), F.col("uvec").alias("a_vec"))
    b = assigned.select(F.col("vid").alias("vec_b"), F.col("uvec").alias("b_vec"))
    return (
        cand.join(a, "vec_a")
        .join(b, "vec_b")
        .filter(_dot(F.col("a_vec"), F.col("b_vec")) >= eps)
        .select("vec_a", "vec_b")
    )


def semantic_dedup(
    embeddings: DataFrame,
    eps: float = 0.45,
    n_cells: "int | None" = 64,
    lloyd_iters: int = 8,
    max_cell: int = 4000,
    keep: str = "centroid_far",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample: "int | None" = DEFAULT_TRAIN_SAMPLE,
    audit: "dict | None" = None,
    centroids: "np.ndarray | None" = None,
) -> DataFrame:
    """E2 — SemDeDup: drop all but one member of every semantic-duplicate
    group. Groups are connected components of the within-cell
    cosine>=eps pair graph (``semantic_dedup_pairs``); the survivor per
    group is picked by ``keep``:

    - ``"centroid_far"`` (the paper's rule): the member with the LOWEST
      cosine to its cluster centroid — of a redundant group, retain the
      most atypical example to preserve diversity. Ties break to min id.
    - ``"min_id"``: the smallest id — fully order-deterministic, the
      rule the exact/minhash text-dedup paths use, and the form the SQL
      oracle can reproduce.

    Returns the surviving rows of ``embeddings`` unchanged. Vectors in
    no pair are singletons and always survive."""
    from .graph import connected_components

    if keep not in ("centroid_far", "min_id"):
        raise ValueError(f"unknown keep rule {keep!r}")
    if centroids is not None:
        cent = centroids  # externally-trained frozen quantizer
    else:
        if n_cells is None:
            n_cells = _auto_n_cells(embeddings, SEMDEDUP_TARGET_CELL_SIZE)
        cent = _centroid_matrix(
            embeddings, n_cells, lloyd_iters, id_col, vec_col, train_sample
        )
    if cent is None:
        return embeddings  # empty corpus
    # ONE training + assignment, shared by the pair stage and the keep
    # rule's centroid-cosine lookup (recomputed per consumer by Catalyst
    # — two column-pruned scans beat materializing a corpus-sized frame)
    assigned = _cell_assignment(embeddings, cent, id_col, vec_col)
    pairs = _pairs_from_cells(assigned, eps, max_cell, audit)
    comp = connected_components(pairs, "vec_a", "vec_b")
    if keep == "min_id":
        # the component label IS the min id — drop every other member
        dropped = comp.filter(F.col("node") != F.col("component"))
    else:
        sims = assigned.select(F.col("vid").alias("node"), "cent_sim")
        w = W.partitionBy("component").orderBy(
            F.col("cent_sim").asc(), F.col("node").asc()
        )
        dropped = (
            comp.join(sims, "node")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") > 1)
        )
    # no broadcast hint: on a duplicate-heavy corpus the dropped set is
    # corpus-scale — let AQE pick the join strategy from its real size
    return embeddings.join(
        dropped.select(F.col("node").alias(id_col)), id_col, "left_anti"
    )


def domain_diversity(
    embeddings: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """E3 analytics — per-domain embedding coherence: the exact centroid
    of each group and every member's cosine to it, reduced to the
    group's mean. Low mean-cosine = diverse domain, high = redundant —
    the signal a training-mix recipe uses to decide which domains need
    more dedup or a lower sampling weight (SemDeDup-style diagnostics).

    Cross-engine exactness: centroid component sums quantize each
    addend to DECIMAL(38,6) (order-independent under shuffle), the
    centroid division and per-vector cosine run in doubles folded in
    strict index order (both engines associate left-to-right), and the
    final per-group mean quantizes the cosines again.

    Scale shape: pass 1 posexplodes to (group, pos) — a dim-x-corpus
    explode, but the aggregation is map-side-combined down to
    |groups| x dim rows (config-sized). Pass 2 broadcasts the centroid
    table and scores each vector with a single higher-order fold — no
    shuffle beyond the final |groups|-row aggregation.
    """
    pe = embeddings.select(group_col, F.posexplode(vec_col).alias("pos", "v"))
    cent_pos = pe.groupBy(group_col, "pos").agg(
        F.sum(F.col("v").cast("double").cast(DEC)).alias("s"),
        F.count("*").alias("n"),
    )
    cent = (
        cent_pos.select(
            group_col,
            "pos",
            (F.col("s").cast("double") / F.col("n")).alias("c"),
        )
        .groupBy(group_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))),
                lambda st: st["c"],
            ).alias("_centroid")
        )
    )
    scored = embeddings.join(F.broadcast(cent), group_col).select(
        group_col, cosine(F.col(vec_col), F.col("_centroid")).alias("_cos")
    )
    return scored.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_vecs"),
        (F.sum(F.col("_cos").cast(DEC)).cast("double") / F.count("*")).alias(
            "mean_cos_to_centroid"
        ),
    )


def hour_of_day_vectors(events: DataFrame, max_users: int) -> DataFrame:
    """Dense 24-dim hour-of-day activity vector per user (exact DECIMAL
    sums cast to double at the end) — the fixed-length representation the
    DTW rerank consumes."""
    lanes = [
        F.sum(
            F.when(F.hour("ts") == h, F.col("value").cast(DEC)).otherwise(
                F.lit(0).cast(DEC)
            )
        )
        .cast("double")
        .alias(f"_h{h}")
        for h in range(24)
    ]
    return (
        events.filter(F.col("user_id") < max_users)
        .groupBy("user_id")
        .agg(*lanes)
        .select(
            "user_id",
            F.array(*[F.col(f"_h{h}") for h in range(24)]).alias("profile"),
        )
    )


def dtw_rerank_topk(
    events: DataFrame,
    k: int = 3,
    cand_k: int = 6,
    max_users: int = 40,
    band: int = 3,
) -> DataFrame:
    """E6 variant — the classic two-stage similarity shape: the cheap
    exact metric (Manhattan on co-active hours) generates ``cand_k``
    candidates per user, then Dynamic Time Warping over dense 24-h
    profiles (Sakoe-Chiba band ``band``) reranks them to the final top
    ``k``. DTW tolerates phase shifts (a user active 1-2 h later still
    matches) that pointwise metrics punish — and is far too expensive to
    run all-pairs, which is exactly why it lives behind a candidate
    stage.

    Scale shape: candidates are O(users x cand_k); each DTW evaluates a
    banded 24x24 DP in a vectorized Arrow batch (numpy, no per-row
    Python) — cost scales with the candidate list, never the corpus.
    """
    from pyspark.sql.types import DoubleType

    cands = timeseries_similarity_topk(events, k=cand_k, max_users=max_users).select(
        "user_a", "user_b"
    )
    prof = hour_of_day_vectors(events, max_users).localCheckpoint(eager=True)

    @F.pandas_udf(DoubleType())
    def _dtw(va: pd.Series, vb: pd.Series) -> pd.Series:
        out = []
        for x_l, y_l in zip(va, vb):
            x = np.asarray(x_l, dtype=np.float64)
            y = np.asarray(y_l, dtype=np.float64)
            n, m = len(x), len(y)
            dp = np.full((n + 1, m + 1), np.inf)
            dp[0, 0] = 0.0
            for i in range(1, n + 1):
                lo = max(1, i - band)
                hi = min(m, i + band)
                for j in range(lo, hi + 1):
                    c = abs(x[i - 1] - y[j - 1])
                    dp[i, j] = c + min(dp[i - 1, j], dp[i, j - 1], dp[i - 1, j - 1])
            out.append(float(dp[n, m]))
        return pd.Series(out)

    a = prof.select(F.col("user_id").alias("user_a"), F.col("profile").alias("pa"))
    b = prof.select(F.col("user_id").alias("user_b"), F.col("profile").alias("pb"))
    scored = (
        cands.join(F.broadcast(a), "user_a")
        .join(F.broadcast(b), "user_b")
        .withColumn("dtw", _dtw("pa", "pb"))
    )
    w = W.partitionBy("user_a").orderBy(F.col("dtw").asc(), F.col("user_b").asc())
    return (
        scored.withColumn("nn_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("nn_rank") <= k)
        .select("user_a", "user_b", "nn_rank", F.col("dtw").alias("dtw_dist"))
    )


# ---------------------------------------------------------------------------
# E3 — product quantization (memory-compressed ANN)
# ---------------------------------------------------------------------------


def _assign_codes(v: "np.ndarray", books: "np.ndarray") -> "np.ndarray":
    """PQ sub-code assignment: per subspace, the euclidean-nearest
    codebook row of each vector's sub-slice, via the identity
    argmin ||x - c||^2 == argmax (x.c - ||c||^2 / 2). ONE definition
    shared by training, encoding, and the IVF-PQ fused encoder — a
    change to tie-breaking or precision cannot drift between them."""
    m, _, sub_dim = books.shape
    codes = np.empty((len(v), m), dtype=np.int32)
    for s in range(m):
        x = v[:, s * sub_dim : (s + 1) * sub_dim]
        cb = books[s]
        codes[:, s] = np.argmax(x @ cb.T - 0.5 * (cb * cb).sum(axis=1), axis=1)
    return codes


def _pq_codebooks(
    embeddings: DataFrame,
    m: int,
    ksub: int,
    lloyd_iters: int,
    id_col: str,
    vec_col: str,
    normalize: bool = True,
    train_sample: "int | None" = DEFAULT_TRAIN_SAMPLE,
) -> np.ndarray:
    """PQ codebook training — one distributed k-means over all ``m``
    subspaces at once, returned as an (m, ksub, sub_dim) array.

    Init mirrors ``_centroid_matrix``: the ksub corpus vectors with the
    smallest xxhash64(id) seed every subspace (deterministic, no RNG).
    Each Lloyd round is ONE cluster pass: a pandas_udf assigns all m
    sub-codes per vector (numpy distance argmin per subspace), then the
    mean-update posexplodes the vector once — dim maps to
    (subspace, within-dim) arithmetically and the code comes from the
    assignment array — so the round costs one shuffle of dim rows per
    vector regardless of m. Only the m*ksub*sub_dim codebook tensor
    (config-sized) reaches the driver.

    Default path (``train_sample`` set): train on the bounded
    ``_hash_sample`` driver-side (``_lloyd_pq`` — identical update rule
    via the shared ``_assign_codes``); ``train_sample=None`` runs the
    full-corpus distributed rounds above.
    """
    from pyspark.sql.functions import pandas_udf

    if train_sample is not None:
        sample = _hash_sample(embeddings, train_sample, id_col, vec_col,
                              normalize=normalize)
        if sample is None:
            return None
        return _lloyd_pq(sample, m, ksub, lloyd_iters)

    vec = unit_vector(F.col(vec_col)) if normalize else F.col(vec_col)
    unit = embeddings.select(F.col(id_col).alias("_id"), vec.alias("u"))
    seeds = (
        unit.orderBy(F.xxhash64(F.col("_id")), F.col("_id"))
        .limit(ksub)
        .select("u")
        .collect()
    )
    if not seeds:  # empty corpus — callers return an empty result frame
        return None
    seed_mat = np.array([r["u"] for r in seeds], dtype=np.float64)  # (ksub, dim)
    dim = seed_mat.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    sub_dim = dim // m
    # books[s] = (ksub, sub_dim) codebook for subspace s
    books = np.stack(
        [seed_mat[:, s * sub_dim : (s + 1) * sub_dim] for s in range(m)]
    )

    for _ in range(lloyd_iters):
        snapshot = books.copy()

        @pandas_udf("array<int>")
        def sub_codes(vecs: pd.Series) -> pd.Series:
            v = np.vstack(vecs.to_numpy()).astype(np.float64)  # (n, dim)
            return pd.Series(list(_assign_codes(v, snapshot)))

        means = (
            unit.select(sub_codes(F.col("u")).alias("codes"),
                        F.posexplode("u").alias("dim", "x"))
            .select(
                (F.col("dim") / sub_dim).cast("int").alias("sub"),
                (F.col("dim") % sub_dim).alias("within"),
                F.element_at("codes", (F.col("dim") / sub_dim).cast("int") + 1)
                 .alias("code"),
                "x",
            )
            .groupBy("sub", "code", "within")
            .agg(F.avg("x").alias("mval"))
            .collect()
        )
        for r in means:  # empty (sub, code) cells keep their previous centroid
            books[r["sub"], r["code"], r["within"]] = r["mval"]
    return books


def pq_encode(
    embeddings: DataFrame,
    books: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize: bool = True,
) -> DataFrame:
    """Encode each (unit-normalized) corpus vector as m sub-codes against
    a trained codebook tensor — the compressed representation PQ scans."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def encode(vecs: pd.Series) -> pd.Series:
        v = np.vstack(vecs.to_numpy()).astype(np.float64)
        if normalize:
            v = _unit_rows(v)
        return pd.Series(list(_assign_codes(v, books)))

    return embeddings.select(
        F.col(id_col).alias("neighbor_id"), encode(F.col(vec_col)).alias("codes")
    )


def pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    ksub: int = 32,
    lloyd_iters: int = 3,
    rerank: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample: "int | None" = DEFAULT_TRAIN_SAMPLE,
) -> DataFrame:
    """E3 scale path (product-quantization variant) — asymmetric-distance
    ANN over a compressed corpus.

    The corpus is stored as m sub-codes per vector (m*log2(ksub) bits —
    at m=8, ksub=256 that is 8 bytes against 256 B of float32 for dim=64,
    a 32x working-set compression; the scan that dominates ANN cost reads
    codes, never vectors). Per query the driver precomputes an (m, ksub)
    lookup table of subspace dot contributions, so scoring a corpus row is
    m table gathers + a sum: score ~= q . x_hat. Each Arrow batch of codes
    is reduced to its local top-(k*rerank) BEFORE the exchange (same
    local-reduce shape as ``brute_force_topk``), then the candidate set —
    O(queries * k * rerank), broadcast-sized — is exact-reranked against
    the true vectors to absorb quantization error.

    Complements the other E3 paths: LSH is data-independent, IVF prunes
    the scan, PQ compresses it; production systems compose IVF+PQ, and
    this operator reuses ``_centroid_matrix``'s training discipline
    (deterministic seeds, distributed Lloyd, config-sized driver state).
    Returns (query_id, neighbor_id, rank); recall vs brute force is
    pinned in tests/test_llm_ops.py.
    """
    books = _pq_codebooks(embeddings, m, ksub, lloyd_iters, id_col, vec_col,
                          train_sample=train_sample)
    if books is None:  # empty corpus
        return embeddings.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, rank int"
        )
    codes = pq_encode(embeddings, books, id_col, vec_col)

    q_rows = queries.select(id_col, vec_col).collect()  # broadcast-sized
    if not q_rows:
        return embeddings.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, rank int"
        )
    qids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Q = np.vstack([np.asarray(r[1], dtype=np.float64) for r in q_rows])
    Q = _unit_rows(Q)
    sub_dim = Q.shape[1] // m
    # luts[i, s, c] = q_i[sub s] . books[s, c]  — per-query ADC tables
    luts = np.einsum(
        "qsd,scd->qsc", Q.reshape(len(Q), m, sub_dim), books
    )
    bc = embeddings.sparkSession.sparkContext.broadcast((qids, luts))
    take = max(k + 1, k * rerank)
    sub_idx = np.arange(m)

    def adc_scan(batches):
        b_qids, b_luts = bc.value
        for pdf in batches:
            ids = pdf["neighbor_id"].to_numpy(dtype=np.int64)
            c = np.vstack(pdf["codes"].to_numpy()).astype(np.int64)  # (n, m)
            out_q, out_n, out_s = [], [], []
            for i in range(len(b_qids)):
                scores = b_luts[i][sub_idx[None, :], c].sum(axis=1)
                order = np.lexsort((ids, -scores))[:take]
                out_q.append(np.full(len(order), b_qids[i]))
                out_n.append(ids[order])
                out_s.append(scores[order])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "adc_score": np.concatenate(out_s),
                }
            )

    local = codes.mapInPandas(
        adc_scan, "query_id long, neighbor_id long, adc_score double"
    )
    w_adc = W.partitionBy("query_id").orderBy(
        F.col("adc_score").desc(), F.col("neighbor_id").asc()
    )
    cand = (
        local.filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("r", F.row_number().over(w_adc))
        .filter(F.col("r") <= take)
        .select("query_id", "neighbor_id")
    )

    return _exact_rerank(cand, embeddings, queries, k, id_col, vec_col)


def _exact_rerank(
    cand: DataFrame,
    embeddings: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Exact rerank of a broadcast-sized (query_id, neighbor_id) candidate
    set: true cosine via the strict-order JVM dot, so rerank ordering
    matches the exact path bit-for-bit. Shared by the PQ and IVF-PQ ANN
    variants.

    The corpus is pruned to the candidate neighbor ids (broadcast
    semi-join) BEFORE normalization: ``unit_vector`` is an interpreted
    higher-order expression, and evaluating it corpus-wide just to feed
    a candidate-sized hash join dominated the whole serve path at scale
    (measured at sf10: 55 s of a 59 s search normalizing 200k vectors
    for a 9k-candidate rerank; 3.4 s after the prune — same discipline
    as ``embedding_neardup_lsh``'s verify stage)."""
    q_df = queries.select(
        F.col(id_col).alias("query_id"), unit_vector(F.col(vec_col)).alias("q_vec")
    )
    # cand now feeds two consumers (the id prune and the scored join) —
    # a lazy checkpoint materializes the candidate scan once, not twice
    cand = cand.localCheckpoint(eager=False)
    needed = cand.select(F.col("neighbor_id").alias(id_col)).distinct()
    c_df = embeddings.join(F.broadcast(needed), id_col, "left_semi").select(
        F.col(id_col).alias("neighbor_id"), unit_vector(F.col(vec_col)).alias("c_vec")
    )
    scored = (
        F.broadcast(cand)
        .join(c_df, "neighbor_id")
        .join(F.broadcast(q_df), "query_id")
        .withColumn("cos_sim", _dot(F.col("q_vec"), F.col("c_vec")))
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ivfpq_train_encode(
    embeddings: DataFrame,
    n_cells: int = 16,
    m: int = 8,
    ksub: int = 32,
    lloyd_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample: "int | None" = DEFAULT_TRAIN_SAMPLE,
    carry_cols: "list[str] | None" = None,
):
    """IVF-PQ index construction: train the coarse quantizer, train PQ
    codebooks on RESIDUALS (x - centroid), and encode the corpus in one
    fused pass. Returns (cent, books, codes_df) — codes_df is
    (neighbor_id, cell, codes [, carry_cols...]), the compressed table a
    deployment persists ONCE (``ivfpq_write_index``) and serves every
    search from; (None, None, None) on an empty corpus."""
    from pyspark.sql.functions import pandas_udf

    cent = _centroid_matrix(embeddings, n_cells, lloyd_iters, id_col, vec_col,
                            train_sample)
    if cent is None:  # empty corpus
        return None, None, None

    @pandas_udf("struct<cell:int, resid:array<double>>")
    def cell_resid(vecs: pd.Series) -> pd.DataFrame:
        v = np.vstack(vecs.to_numpy()).astype(np.float64)
        v = _unit_rows(v)
        cells = np.argmax(v @ cent.T, axis=1).astype(np.int32)
        resid = v - cent[cells]
        return pd.DataFrame({"cell": cells, "resid": list(resid)})

    resid_df = embeddings.select(
        F.col(id_col).alias("neighbor_id"), cell_resid(F.col(vec_col)).alias("cr")
    ).select("neighbor_id", F.col("cr.cell").alias("cell"),
             F.col("cr.resid").alias("resid"))

    books = _pq_codebooks(
        resid_df, m, ksub, lloyd_iters,
        id_col="neighbor_id", vec_col="resid", normalize=False,
        train_sample=train_sample,
    )
    return cent, books, ivfpq_encode(
        embeddings, cent, books, id_col, vec_col, carry_cols
    )


def ivfpq_encode(
    embeddings: DataFrame,
    cent: "np.ndarray",
    books: "np.ndarray",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    carry_cols: "list[str] | None" = None,
) -> DataFrame:
    """Encode vectors against FROZEN quantizers — one fused pass: cell
    assignment + residual + sub-codes from the raw vectors (re-joining
    codes to the cell column would duplicate the residual subtree — two
    corpus scans for what one map computes). Per-row deterministic given
    (cent, books), which is what lets an incrementally-built codes table
    equal the one-shot build (pinned by the incremental-index tests).

    ``carry_cols`` rides small metadata columns (e.g. a label/tenant
    key) on the codes rows so filtered searches can prune candidates in
    the codes scan without ever touching the vector table."""
    carry = list(carry_cols or [])

    def encode_with_cell(batches):
        for pdf in batches:
            v = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            v = _unit_rows(v)
            cells = np.argmax(v @ cent.T, axis=1)
            cc = _assign_codes(v - cent[cells], books)
            out = {
                "neighbor_id": pdf[id_col].to_numpy(dtype=np.int64),
                "cell": cells.astype(np.int32),
                "codes": list(cc),
            }
            for c in carry:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    schema = "neighbor_id long, cell int, codes array<int>"
    if carry:
        types = dict(embeddings.dtypes)
        schema += "".join(f", {c} {types[c]}" for c in carry)
    return embeddings.select(id_col, vec_col, *carry).mapInPandas(
        encode_with_cell, schema
    )


def ivfpq_adc_candidates(
    codes: DataFrame,
    cent,
    books,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 8,
    rerank: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    filter_col: "str | None" = None,
) -> DataFrame:
    """The corpus-sized half of an IVF-PQ search: ADC-score the codes
    table against the (broadcast-sized) query set and reduce to the
    top-(k*rerank) candidates per query. Reads ONLY codes — never an
    embedding column (the plan property a deployment relies on; pinned
    by test over this function's plan, since the downstream rerank
    checkpoint truncates the visible lineage). Returns
    (query_id, neighbor_id); ``ivfpq_search`` composes this with the
    shared exact rerank.

    ``filter_col`` (carried on BOTH the codes rows — see
    ``ivfpq_encode(carry_cols=...)`` — and the query frame) makes this a
    FILTERED search: within each probed cell a query scores only the
    rows whose value equals its own, so the top-(k*rerank) cut is taken
    over eligible candidates — pre-filter semantics, not a post-filter
    that under-fills k. NULL filter values match nothing (SQL
    equality)."""
    m = books.shape[0]

    q_cols = [id_col, vec_col] + ([filter_col] if filter_col else [])
    q_rows = queries.select(*q_cols).collect()  # broadcast-sized
    if filter_col:
        q_rows = [r for r in q_rows if r[2] is not None]
    if not q_rows:
        return codes.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long"
        )
    qids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Q = np.vstack([np.asarray(r[1], dtype=np.float64) for r in q_rows])
    Q = _unit_rows(Q)
    qfil = [r[2] for r in q_rows] if filter_col else None
    sub_dim = Q.shape[1] // m
    luts = np.einsum("qsd,scd->qsc", Q.reshape(len(Q), m, sub_dim), books)
    # probe map: cell -> [(query_idx, q . c_cell offset), ...]
    qc = Q @ cent.T  # (n_queries, n_cells)
    probe: dict[int, list[tuple[int, float]]] = {}
    for qi in range(len(qids)):
        for c in np.argsort(-qc[qi])[:nprobe]:
            probe.setdefault(int(c), []).append((qi, float(qc[qi, c])))
    bc = codes.sparkSession.sparkContext.broadcast((qids, luts, probe, qfil))
    take = max(k + 1, k * rerank)
    sub_idx = np.arange(m)
    scan_cols = ["neighbor_id", "cell", "codes"] + (
        [filter_col] if filter_col else []
    )

    def adc_scan(batches):
        b_qids, b_luts, b_probe, b_qfil = bc.value
        for pdf in batches:
            ids = pdf["neighbor_id"].to_numpy(dtype=np.int64)
            cells = pdf["cell"].to_numpy(dtype=np.int64)
            c = np.vstack(pdf["codes"].to_numpy()).astype(np.int64)
            fvals = pdf[filter_col].to_numpy() if b_qfil is not None else None
            acc: dict[int, tuple[list, list]] = {}
            for cell, plist in b_probe.items():
                mask = cells == cell
                if not mask.any():
                    continue
                rows = np.nonzero(mask)[0]
                sub_codes = c[rows]
                sub_ids = ids[rows]
                sub_f = fvals[rows] if fvals is not None else None
                for qi, offset in plist:
                    if sub_f is not None:
                        fmask = sub_f == b_qfil[qi]
                        if not fmask.any():
                            continue
                        q_codes, q_ids = sub_codes[fmask], sub_ids[fmask]
                    else:
                        q_codes, q_ids = sub_codes, sub_ids
                    scores = offset + b_luts[qi][
                        sub_idx[None, :], q_codes
                    ].sum(axis=1)
                    qa = acc.setdefault(qi, ([], []))
                    qa[0].append(q_ids)
                    qa[1].append(scores)
            out_q, out_n, out_s = [], [], []
            for qi, (id_parts, sc_parts) in acc.items():
                all_ids = np.concatenate(id_parts)
                all_sc = np.concatenate(sc_parts)
                order = np.lexsort((all_ids, -all_sc))[:take]
                out_q.append(np.full(len(order), b_qids[qi]))
                out_n.append(all_ids[order])
                out_s.append(all_sc[order])
            if out_q:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(out_q),
                        "neighbor_id": np.concatenate(out_n),
                        "adc_score": np.concatenate(out_s),
                    }
                )
            else:
                yield pd.DataFrame(
                    {
                        "query_id": pd.Series([], dtype="int64"),
                        "neighbor_id": pd.Series([], dtype="int64"),
                        "adc_score": pd.Series([], dtype="float64"),
                    }
                )

    local = codes.select(*scan_cols).mapInPandas(
        adc_scan, "query_id long, neighbor_id long, adc_score double"
    )
    w_adc = W.partitionBy("query_id").orderBy(
        F.col("adc_score").desc(), F.col("neighbor_id").asc()
    )
    return (
        local.filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("r", F.row_number().over(w_adc))
        .filter(F.col("r") <= take)
        .select("query_id", "neighbor_id")
    )


def ivfpq_search(
    codes: DataFrame,
    cent,
    books,
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 8,
    rerank: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    filter_col: "str | None" = None,
) -> DataFrame:
    """IVF-PQ search over a built (or loaded) index: the ADC candidate
    scan (``ivfpq_adc_candidates``) reads ONLY the codes table —
    ``embeddings`` is touched exclusively by the broadcast-sized exact
    rerank of candidates (and never by the scan, which is the point of
    storing codes). With ``filter_col`` (carried on the codes rows) the
    candidate cut respects the query's filter value, and the rerank
    inherits the filter through the candidate set."""
    cand = ivfpq_adc_candidates(
        codes, cent, books, queries, k, nprobe, rerank, id_col, vec_col,
        filter_col,
    )
    return _exact_rerank(cand, embeddings, queries, k, id_col, vec_col)


def ivfpq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 8,
    m: int = 8,
    ksub: int = 32,
    lloyd_iters: int = 2,
    rerank: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample: "int | None" = DEFAULT_TRAIN_SAMPLE,
) -> DataFrame:
    """E3 scale path (IVF+PQ composition) — the production ANN layout:
    an inverted file prunes the scan to ``nprobe`` cells, and within
    them product-quantized RESIDUALS (x - centroid) are scored by
    asymmetric distance, so the scan reads cell ids + codes, never
    vectors. Composition of ``ivfpq_train_encode`` + ``ivfpq_search``
    (a deployment runs training once via ``ivfpq_write_index`` and
    serves searches from the persisted codes table instead).

    Residual encoding is what makes the composition better than either
    part alone: residuals are centered near zero with far less variance
    than raw vectors, so the same codebook budget quantizes them much
    more tightly. The score decomposes exactly:
    q . x_hat = q . c_cell + q . r_hat — the first term is one scalar
    per (query, probed cell) computed on the driver, the second is the
    same m-gather ADC sum as ``pq_topk`` (the residual LUTs do not
    depend on the cell, so one (m, ksub) table per query serves all its
    probed cells). Candidates reduce to local top-k per Arrow batch
    before the exchange; a broadcast-sized exact rerank absorbs
    quantization error. Recall vs brute force pinned in pytest.

    Defaults are tuned for the 500-vector near-isotropic fixture, where
    cells barely separate neighbors (nprobe=8 of 16 probes half the
    file — the plain-IVF entry hits the same wall). At production scale
    with clustered data, nprobe << n_cells is the operating point and
    the knobs trade recall for scan fraction exactly as here.
    """
    cent, books, codes = ivfpq_train_encode(
        embeddings, n_cells, m, ksub, lloyd_iters, id_col, vec_col,
        train_sample,
    )
    if cent is None:  # empty corpus
        return embeddings.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, rank int"
        )
    return ivfpq_search(
        codes, cent, books, embeddings, queries, k, nprobe, rerank,
        id_col, vec_col,
    )


def ivfpq_write_index(
    embeddings: DataFrame,
    path: str,
    n_cells: int = 16,
    m: int = 8,
    ksub: int = 32,
    lloyd_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample: "int | None" = DEFAULT_TRAIN_SAMPLE,
    carry_cols: "list[str] | None" = None,
) -> None:
    """Persist an IVF-PQ index: the codes table as parquet REPARTITIONED
    BY CELL (searches prune whole files by the probed cells' min/max
    stats) plus the config-sized quantizer tensors as .npy next to it.
    Built once per corpus version; every search then reads codes — at
    m=8 sub-codes a fraction of the vector bytes — instead of
    re-encoding the corpus in-plan. ``carry_cols`` rides filter
    metadata (label/tenant) on the codes rows for filtered serving."""
    import os

    cent, books, codes = ivfpq_train_encode(
        embeddings, n_cells, m, ksub, lloyd_iters, id_col, vec_col,
        train_sample, carry_cols,
    )
    if cent is None:
        raise ValueError("cannot build an IVF-PQ index over an empty corpus")
    (
        codes.repartitionByRange(max(4, n_cells // 4), "cell")
        .sortWithinPartitions("cell")
        .write.mode("overwrite")
        .parquet(os.path.join(path, "codes"))
    )
    np.save(os.path.join(path, "cent.npy"), cent)
    np.save(os.path.join(path, "books.npy"), books)


def ivfpq_topk_from_index(
    spark,
    path: str,
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 8,
    rerank: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    filter_col: "str | None" = None,
) -> DataFrame:
    """Serve IVF-PQ searches from a persisted index (``ivfpq_write_index``):
    identical results to the in-plan ``ivfpq_topk`` (training is
    deterministic, so a rebuilt index encodes the same codes — pinned in
    tests), but the corpus-sized work is ONE parquet scan of the codes
    table; vectors are read only for the candidate rerank. With
    ``filter_col`` (the index must have been written with
    ``carry_cols=[filter_col]``) this is filtered vector search at the
    index layer: the codes scan prunes by the query's filter value
    BEFORE the candidate cut — never touching the vector table for
    ineligible rows."""
    import os

    cent = np.load(os.path.join(path, "cent.npy"))
    books = np.load(os.path.join(path, "books.npy"))
    codes = spark.read.parquet(os.path.join(path, "codes"))
    if filter_col and filter_col not in codes.columns:
        raise ValueError(
            f"filtered serve needs {filter_col!r} carried on the index "
            f"codes (ivfpq_write_index(carry_cols=[{filter_col!r}])); "
            f"index at {path} has columns {codes.columns}"
        )
    return ivfpq_search(
        codes, cent, books, embeddings, queries, k, nprobe, rerank,
        id_col, vec_col, filter_col,
    )


# ---------------------------------------------------------------------------
# E3 — PCA dimensionality reduction (the standard pre-ANN compression)
# ---------------------------------------------------------------------------

def pca_train(
    embeddings: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample: "int | None" = DEFAULT_TRAIN_SAMPLE,
):
    """Train a k-component PCA on the bounded deterministic hash-sample
    (the same replay-stable sample the IVF/PQ quantizers train on, UN-
    normalized — PCA centers instead). Returns ``(mean, components)``
    numpy arrays: mean (dim,), components (k, dim) row-orthonormal,
    variance-ordered. Driver-side SVD over the sample keeps training
    cost corpus-size-independent; each component's sign is fixed so its
    largest-|coordinate| entry is positive, making the basis
    deterministic across BLAS builds (SVD sign is otherwise arbitrary).
    """
    sample = _hash_sample(embeddings, train_sample or DEFAULT_TRAIN_SAMPLE,
                          id_col, vec_col, normalize=False)
    if sample is None:
        return None, None
    if not 1 <= k <= sample.shape[1]:
        raise ValueError(
            f"k must be in [1, dim={sample.shape[1]}], got {k}"
        )
    mean = sample.mean(axis=0)
    centered = sample - mean
    # full_matrices=False: Vt is (min(n,dim), dim) — rows are the
    # principal axes, already variance-ordered by singular value
    _, _, vt = np.linalg.svd(centered, full_matrices=False)
    comps = vt[:k].copy()
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps


def pca_project(
    embeddings: DataFrame,
    mean,
    components,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Project every vector onto a trained PCA basis:
    ``(x - mean) @ components.T`` — one broadcast of the (k+1) x dim
    tensors and one numpy matmul per Arrow batch, no shuffle. Returns
    (id, embedding) with the REDUCED array so the output drops into
    every downstream consumer (ANN, SemDeDup, domain diversity)
    unchanged — PCA-then-index is the standard recipe for cutting ANN
    memory/scan cost when the embedding dim is oversized."""
    sess = embeddings.sparkSession
    bc = sess.sparkContext.broadcast(
        (np.asarray(mean, dtype=np.float64),
         np.asarray(components, dtype=np.float64))
    )

    def project(batches):
        m, c = bc.value
        for pdf in batches:
            v = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            out = (v - m) @ c.T
            yield pd.DataFrame(
                {id_col: pdf[id_col], vec_col: list(out)}
            )

    return embeddings.select(id_col, vec_col).mapInPandas(
        project, f"{id_col} long, {vec_col} array<double>"
    )


def pca_reduce(
    embeddings: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample: "int | None" = DEFAULT_TRAIN_SAMPLE,
) -> DataFrame:
    """Convenience: train on the hash-sample, project the corpus."""
    mean, comps = pca_train(embeddings, k, id_col, vec_col, train_sample)
    if mean is None:
        return embeddings.select(id_col, vec_col).limit(0)
    return pca_project(embeddings, mean, comps, id_col, vec_col)


def random_project(
    embeddings: DataFrame,
    k: int,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """E3 — Johnson-Lindenstrauss random projection to k dims: multiply
    every vector by a FIXED seeded Gaussian matrix scaled 1/sqrt(k)
    (numpy's legacy RandomState generator, whose output is frozen
    across versions — the matrix is reproducible from the seed alone,
    no training pass at all). JL preserves pairwise distances/cosines
    within (1±eps) for ANY data distribution — the complement of
    ``pca_reduce``, which wins when variance concentrates in a low-rank
    subspace but cannot help isotropic corpora. Same scale shape as the
    PCA projection: one broadcast of the dim x k matrix, one numpy
    matmul per Arrow batch, no shuffle; output keeps (id, vec) so it
    composes with every downstream consumer."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    sess = embeddings.sparkSession
    first = embeddings.select(vec_col).first()
    if first is None:
        return embeddings.select(id_col, vec_col).limit(0)
    dim = len(first[0])
    rng = np.random.RandomState(seed)
    mat = rng.randn(dim, k) / np.sqrt(k)
    bc = sess.sparkContext.broadcast(mat)

    def project(batches):
        m = bc.value
        for pdf in batches:
            v = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame({id_col: pdf[id_col], vec_col: list(v @ m)})

    return embeddings.select(id_col, vec_col).mapInPandas(
        project, f"{id_col} long, {vec_col} array<double>"
    )


def embedding_profile(
    embeddings: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """E3 diagnostics — per-dimension corpus statistics (count, exact
    decimal-quantized mean, min, max): the first thing a pipeline runs
    on a new embedding dump — dead dimensions (min == max), biased
    encoders (|mean| >> 0), scale drift between snapshots. One
    posexplode + one map-side-combined groupBy on the (tiny) dimension
    index; output is dim-sized. Means quantize addends to
    DECIMAL(38,6) after a double widening so the fold is
    order-independent and matches the SQL oracle bit-for-bit."""
    pe = embeddings.select(F.posexplode(vec_col).alias("_p", "v")).select(
        F.col("_p").cast("long").alias("pos"), "v"
    )
    return pe.groupBy("pos").agg(
        F.count("*").cast("long").alias("n"),
        (
            F.sum(F.col("v").cast("double").cast(DEC)).cast("double")
            / F.count("*")
        ).alias("mean_v"),
        F.min(F.col("v").cast("double")).alias("min_v"),
        F.max(F.col("v").cast("double")).alias("max_v"),
    )
