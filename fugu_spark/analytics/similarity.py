"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: brute-force exact top-k — the baseline. Pure column
  arithmetic (zip_with dot product), scales linearly; the scan is
  embarrassingly parallel and the top-k is TakeOrderedAndProject.
- ``lsh_topk``: random-hyperplane LSH variant — the scale path. Signatures
  are deterministic (splitmix64-seeded planes); candidates are rows whose
  signature Hamming-distance to the query is ≤ ``max_probe``; exact cosine
  re-rank within candidates. At 100 TB the signature column is tiny and
  bucket-prunable; recall/cost trades via n_planes/max_probe.
- ``embedding_dup_pairs``: near-duplicate pairs by cosine ≥ threshold with
  LSH-bucket blocking (never all-pairs).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine_expr(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def _query_lit(query_vec: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in query_vec])


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    where: Column | None = None,
) -> DataFrame:
    """Exact brute-force cosine top-k: (id, score), (score DESC, id ASC).

    ``where`` is an optional metadata predicate (filtered kNN — the
    ES knn `filter` / vector-store pre-filter shape). It is applied
    BEFORE any similarity work, so it pushes down to the parquet scan
    and the top-k always holds k true neighbors from the allowed set —
    post-filtering an unfiltered top-k would under-fill k whenever the
    filter is selective."""
    q = _query_lit(query_vec)
    if where is not None:
        embeddings = embeddings.filter(where)
    return (
        embeddings.select(
            F.col(id_col), cosine_expr(F.col(vec_col), q).alias("score")
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def batch_cosine_topk(
    embeddings: DataFrame,
    queries: "list[tuple[int, list[float]]] | dict[int, list[float]]",
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    where: Column | None = None,
) -> DataFrame:
    """Batch ANN: MANY query vectors, ONE Spark job — the embedding
    analog of batch retrieval (hard-negative mining, eval sweeps,
    dedup-vs-index at training-pipeline scale). ``where`` (filtered
    kNN) pre-filters the row set before the matmul kernel — one shared
    predicate for every query in the batch, pushed to the scan.

    → DataFrame(query_id, vec_id, score, rank ≤ k), score = cosine.

    Dataflow: the normalized query matrix broadcasts into a mapInPandas
    kernel that computes one (rows × queries) matmul per Arrow batch and
    keeps a per-partition top-(k+8) per query (global top-k ⊆ union of
    per-partition top-k, so candidate selection is exact; the +8 margin
    absorbs f32/f64 boundary ulps). The ≤ (k+8)·|Q| survivors per
    partition then rejoin the embeddings and rescore with
    :func:`cosine_expr` — the SAME ascending-index fold the per-query
    entries (and the SQL oracle) use, so final scores are bit-identical
    to the brute-force path — before the per-query window. Shuffle
    volume is O(partitions · queries · k), never O(rows · queries)."""
    from pyspark.sql import Window

    if isinstance(queries, dict):
        queries = list(queries.items())
    qids = [int(q) for q, _ in queries]
    qmat = np.asarray([v for _, v in queries], dtype=np.float64)
    qnorm = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    spark = embeddings.sparkSession
    margin = k + 8

    def part_topk(batches):
        best_s: dict[int, np.ndarray] = {}
        best_v: dict[int, np.ndarray] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            V = V / np.linalg.norm(V, axis=1, keepdims=True)
            S = V @ qnorm.T  # rows × queries
            ids = pdf[id_col].to_numpy(np.int64)
            for j in range(S.shape[1]):
                s = np.concatenate([best_s.get(j, np.empty(0)), S[:, j]])
                v = np.concatenate(
                    [best_v.get(j, np.empty(0, np.int64)), ids]
                )
                if len(s) > margin:
                    keep = np.lexsort((v, -s))[:margin]
                    s, v = s[keep], v[keep]
                best_s[j], best_v[j] = s, v
        rows = {
            "query_id": np.concatenate(
                [np.full(len(v), qids[j], dtype=np.int64) for j, v in best_v.items()]
            )
            if best_v
            else np.empty(0, np.int64),
            "vec_id": np.concatenate(list(best_v.values()))
            if best_v
            else np.empty(0, np.int64),
        }
        import pandas as pd

        yield pd.DataFrame(rows)

    if where is not None:
        embeddings = embeddings.filter(where)
    cand = embeddings.select(id_col, vec_col).mapInPandas(
        part_topk, schema="query_id long, vec_id long"
    )
    qdf = spark.createDataFrame(
        [(int(q), [float(x) for x in v]) for q, v in queries],
        f"query_id long, qvec array<double>",
    )
    scored = (
        cand.join(
            embeddings.select(
                F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v")
            ),
            "vec_id",
        )
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id",
            "vec_id",
            cosine_expr(F.col("_v"), F.col("qvec")).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )


def _planes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes via counter-hash → N(0,1)
    (Box-Muller over splitmix64 uniforms)."""
    mask = np.uint64(0xFFFFFFFFFFFFFFFF)

    def mix(x):
        x = (x + np.uint64(0x9E3779B97F4A7C15)) & mask
        x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & mask
        x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & mask
        return x ^ (x >> np.uint64(31))

    n = n_planes * dim
    i = np.arange(n, dtype=np.uint64) + np.uint64(seed * 1_000_003)
    u1 = (mix(i).astype(np.float64) + 1.0) / 18446744073709551616.0
    u2 = mix(i + np.uint64(0x9E3779B9)).astype(np.float64) / 18446744073709551616.0
    g = np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)
    return g.reshape(n_planes, dim)


def lsh_signature_expr(vec_col: Column, planes: np.ndarray) -> Column:
    """Signature as a long: bit i = sign(dot(vec, plane_i))."""
    bits = [
        F.when(_dot(vec_col, F.array(*[F.lit(float(v)) for v in plane])) > 0, F.lit(1 << i)).otherwise(
            F.lit(0)
        )
        for i, plane in enumerate(planes)
    ]
    out = F.lit(0)
    for b in bits:
        out = out + b
    return out.cast("long")


def build_ann_index(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Precompute the LSH signature column ONCE (persist/write the result,
    e.g. partitioned by ``lsh_sig``): at corpus scale the per-query
    signature recompute IS the full-scan cost, so serving must read a
    stored signature column and prune on it. Signatures are deterministic
    in (n_planes, seed) — queries must hash with the same pair."""
    dim = len(embeddings.select(vec_col).first()[0])
    planes = _planes(dim, n_planes, seed)
    return embeddings.withColumn("lsh_sig", lsh_signature_expr(F.col(vec_col), planes))


def query_signature(query_vec: list[float], n_planes: int = 12, seed: int = 42) -> int:
    planes = _planes(len(query_vec), n_planes, seed)
    qv = np.asarray(query_vec, dtype=np.float64)
    qsig = 0
    for i in range(n_planes):
        if float(planes[i] @ qv) > 0:
            qsig |= 1 << i
    return qsig


def lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    max_probe: int = 2,
    seed: int = 42,
    where: Column | None = None,
) -> DataFrame:
    """ANN top-k: prune to rows whose LSH signature is within
    ``max_probe`` bits of the query's, then exact cosine re-rank.

    If ``embeddings`` already carries an ``lsh_sig`` column (from
    :func:`build_ann_index`, same n_planes/seed), it is used as-is — the
    scale path; otherwise the signature is computed inline (ad-hoc path,
    one full scan).

    ``where`` (filtered kNN) pre-filters on metadata before the
    signature prune, so both predicates reach the same scan and recall
    is measured against the allowed set — the strategy every
    filter-aware ANN engine uses when the filter is cheap columnar
    metadata (post-filtering the probe set under-fills k at high
    selectivity)."""
    qsig = query_signature(query_vec, n_planes, seed)
    if "lsh_sig" in embeddings.columns:
        df = embeddings
    else:
        planes = _planes(len(query_vec), n_planes, seed)
        df = embeddings.withColumn("lsh_sig", lsh_signature_expr(F.col(vec_col), planes))
    if where is not None:
        df = df.filter(where)
    q = _query_lit(query_vec)
    return (
        df.filter(F.bit_count(F.col("lsh_sig").bitwiseXOR(F.lit(qsig))) <= max_probe)
        .select(F.col(id_col), cosine_expr(F.col(vec_col), q).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def build_ivf_index(
    embeddings: DataFrame,
    n_centroids: int = 16,
    iters: int = 5,
    sample: int = 4096,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, np.ndarray]:
    """IVF coarse quantizer: deterministic Lloyd k-means on a bounded
    driver-side sample (first ``sample`` rows by id — reproducible), then
    one vectorized assignment pass over the full table. Returns
    (embeddings + ``ivf_cell`` column, centroids).

    At scale: write the returned frame ``partitionBy('ivf_cell')`` so a
    query's ``nprobe`` cells prune to nprobe/n_centroids of the data at
    the parquet-directory level."""
    import pandas as pd

    samp = np.asarray(
        [
            list(r[vec_col])
            for r in embeddings.select(vec_col).orderBy(id_col).limit(sample).collect()
        ],
        dtype=np.float64,
    )
    n = len(samp)
    k = min(n_centroids, n)
    # deterministic init: spread over the sorted sample
    cent = samp[np.linspace(0, n - 1, k).astype(int)].copy()
    for _ in range(iters):
        d = ((samp[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(k):
            members = samp[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    bc = embeddings.sparkSession.sparkContext.broadcast(cent)

    def assign_cells(batches):
        c = bc.value
        c_sq = (c**2).sum(axis=1)
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            # argmin ||x-c||^2 = argmin c·c − 2 x·c (x·x constant per row)
            cell = (c_sq[None, :] - 2.0 * (x @ c.T)).argmin(axis=1)
            out = pdf.copy()
            out["ivf_cell"] = cell.astype("int32")
            yield out

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in embeddings.schema.fields)
    indexed = embeddings.mapInPandas(assign_cells, schema=f"{fields}, ivf_cell int")
    return indexed, cent


def ivf_topk(
    indexed: DataFrame,
    centroids: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    where: Column | None = None,
) -> DataFrame:
    """ANN top-k over an IVF-indexed frame: probe the ``nprobe`` nearest
    cells, exact cosine re-rank inside them. ``nprobe == n_centroids``
    degenerates to the exact brute-force scan (pinned in tests).

    ``where`` (filtered kNN) composes with the cell prune: both are
    scan predicates on the indexed frame (cell-directory pruning +
    columnar metadata filter), applied before any vector math."""
    qv = np.asarray(query_vec, dtype=np.float64)
    d = ((centroids - qv[None, :]) ** 2).sum(axis=1)
    probes = [int(c) for c in d.argsort(kind="stable")[:nprobe]]
    q = _query_lit(query_vec)
    if where is not None:
        indexed = indexed.filter(where)
    return (
        indexed.filter(F.col("ivf_cell").isin(probes))
        .select(F.col(id_col), cosine_expr(F.col(vec_col), q).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def lsh_band_params(
    threshold: float, target_recall: float = 0.98, max_planes: int = 192
) -> tuple[int, int]:
    """(bands, bits_per_band) sized so a pair at exactly ``threshold``
    cosine becomes a candidate with probability ≥ ``target_recall``.

    A hyperplane bit agrees with probability p = 1 − acos(t)/π; one band
    of r bits fully matches with p^r; ANY of b bands matching makes the
    pair a candidate: 1 − (1−p^r)^b. Larger r → smaller (2^r-way) buckets
    per band, so pick the largest r whose required b fits ``max_planes``
    total hyperplanes. At threshold 0.95 this yields b=14 bands of r=13
    bits (predicted recall 0.98, 8192 buckets per band) — vs the
    single-band-equality blocking it replaces, whose recall at 0.95 was
    ≈ (1 − acos(.95)/π)^12 ≈ 0.28."""
    import math

    t = min(max(threshold, -1.0), 1.0)
    p = 1.0 - math.acos(t) / math.pi
    for r in range(16, 0, -1):
        pr = p**r
        if pr >= 1.0:
            return 1, r
        if pr <= 0.0:
            continue
        b = math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - pr))
        if b * r <= max_planes:
            return b, r
    return max_planes, 1


def banded_signatures(
    embeddings: DataFrame,
    bands: int,
    bits_per_band: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """(id, band, bucket) rows: one vectorized mapInPandas pass — the
    whole batch is one (n × dim) @ (dim × b·r) matmul, bits packed per
    band with a shift-and-sum (no per-row Python)."""
    import pandas as pd

    dim = len(embeddings.select(vec_col).first()[0])
    planes = _planes(dim, bands * bits_per_band, seed)
    bc = embeddings.sparkSession.sparkContext.broadcast(planes)
    nb, r = bands, bits_per_band

    def gen(batches):
        pl = bc.value
        w = 1 << np.arange(r, dtype=np.uint64)
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            bits = (x @ pl.T) > 0  # (n, nb·r)
            buckets = (
                (bits.reshape(len(x), nb, r).astype(np.uint64) * w[None, None, :])
                .sum(axis=2)
                .astype(np.int64)
            )
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), nb),
                    "band": np.tile(np.arange(nb, dtype=np.int32), len(x)),
                    "bucket": buckets.reshape(-1),
                }
            )

    return embeddings.select(id_col, vec_col).mapInPandas(
        gen, schema=f"{id_col} long, band int, bucket long"
    )


def embedding_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int | None = None,
    bits_per_band: int | None = None,
    seed: int = 42,
    target_recall: float = 0.98,
    max_bucket: int | None = 1_000_000,
) -> DataFrame:
    """Near-dup pairs by cosine ≥ threshold with MULTI-BAND LSH blocking:
    a pair is a candidate if ANY band's bucket matches, then exact cosine
    verify. Precision is exact (verification); recall ≥ ``target_recall``
    at the threshold by construction (:func:`lsh_band_params`), pinned
    against brute-force ground truth in tests.

    ``max_bucket`` drops (band, bucket) groups larger than the cap before
    the self-join — the skew guard for 10^12-row corpora (a degenerate
    bucket makes the join quadratic in its size). A pair sharing only
    over-cap buckets is missed; with b bands a pair has b independent
    chances, so the documented recall floor degrades only for vectors
    inside >max_bucket-sized near-duplicate clusters (which exact-dedup
    upstream should have collapsed). Set None to disable."""
    if bands is None or bits_per_band is None:
        bands, bits_per_band = lsh_band_params(threshold, target_recall)
    sig = banded_signatures(embeddings, bands, bits_per_band, id_col, vec_col, seed)
    if max_bucket is not None:
        counts = sig.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("_n"))
        sig = sig.join(counts.filter(F.col("_n") <= max_bucket), ["band", "bucket"]).drop("_n")
    a = sig.select(F.col(id_col).alias("id_a"), "band", "bucket")
    b = sig.select(F.col(id_col).alias("id_b"), "band", "bucket")
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    ea = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    eb = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .withColumn("cosine", cosine_expr(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def semdedup(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_centroids: int = 16,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication for training corpora — k-means-cluster the embedding
    space, then inside each cluster drop every point that has a
    LOWER-ID near-duplicate (cosine ≥ ``threshold``). Returns the input
    rows plus a ``keep`` boolean.

    Deterministic greedy rule (one pass, SQL-expressible): x is dropped
    iff ∃ y in x's cluster with id_y < id_x and cos(x, y) ≥ τ. The
    paper keeps the point farthest from the centroid per dup-group;
    ranking by id instead makes the survivor set reproducible across
    partitionings and engines (pinned divergence).

    Scale shape: clustering reuses :func:`build_ivf_index`'s
    deterministic Lloyd pass (bounded driver sample + one vectorized
    Arrow assignment scan). The pair join shuffles BOTH sides once on
    ``ivf_cell`` — quadratic only within a cluster, so ``n_centroids``
    should grow with the corpus (the paper uses ~0.1% of n; E[cluster]
    stays bounded). n_centroids=1 degenerates to exact all-pairs
    semantics — that is the oracle-verified entry; pytest pins that
    clustered survivor sets are supersets of the exact one (clusters
    only REMOVE candidate pairs)."""
    indexed, _ = build_ivf_index(
        embeddings, n_centroids=n_centroids, iters=iters, seed=seed,
        id_col=id_col, vec_col=vec_col,
    )
    a = indexed.select(
        F.col(id_col).alias("_id_a"), F.col(vec_col).alias("_va"), "ivf_cell"
    )
    b = indexed.select(
        F.col(id_col).alias("_id_b"), F.col(vec_col).alias("_vb"), "ivf_cell"
    )
    drops = (
        a.join(b, "ivf_cell")
        .filter(F.col("_id_a") < F.col("_id_b"))
        .filter(cosine_expr(F.col("_va"), F.col("_vb")) >= F.lit(float(threshold)))
        .select(F.col("_id_b").alias("_drop_id"))
        .distinct()
    )
    return (
        indexed.drop("ivf_cell")
        .join(drops, indexed[id_col] == drops["_drop_id"], "left")
        .withColumn("keep", F.col("_drop_id").isNull())
        .drop("_drop_id")
    )
