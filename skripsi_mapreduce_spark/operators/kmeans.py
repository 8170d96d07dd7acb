"""Iterative K-Means over sparse long-form feature vectors (SURVEY.md §2.3,
reference ``-a 3``).

Semantics contract (cited to /root/reference/):
- Init: k document ids drawn uniformly without replacement; their vectors
  are centroids 0..k-1 (JobExtractFeature.java:143-158 O26 — the reference
  is UNSEEDED and can draw the nonexistent id 0, §8 Q5; the engine seeds
  the draw over 1..N and documents the deviation).
- Assign: nearest centroid by Euclidean distance (MapperKMean.java:83-108
  O31/O32); ties -> lowest cluster index (the reference's HashMap iteration
  order is nondeterministic; we define it).
- Update: centroid = elementwise mean of member vectors, rounded HALF_UP to
  10dp (ReducerKMean.java:31-59 O33); per-cluster SSE = sum of squared
  distances (O34).
- Converge: exact equality of rounded centroid maps
  (JobClustering.java:210,227-232 O37), or m-1 iterations — the reference
  loop runs AT MOST m-1 times (App.java:122-145, §8 Q4), reproduced here.
- Empty clusters silently vanish (k shrinks), as in the reference (§2.3).

Scale design: one Spark job per iteration (vs the reference's five
materialization boundaries per iteration, §3.4). Centroids are k x |active
vocab| — small — so they move driver->executors as a BROADCAST table
(replacing the per-task distributed-cache load, MapperKMean.java:55-80
O30); documents never leave their partitions except for the one
groupBy(cluster, word) shuffle of the update step, which Catalyst
partial-aggregates map-side. Distance uses the sparse-safe expansion
||x||^2 + ||c||^2 - 2x.c (the reference's dense nested loop,
MapperKMean.java:88-92, NPEs on missing keys — §8 Q10). Per-iteration
lineage is cut with localCheckpoint so plan depth stays O(1), not O(m).
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..io import local_df


# The literal-centroid assign path embeds every centroid weight in the
# plan as a map literal; past this many total (cluster, word) entries the
# plan itself becomes the bottleneck and assignment falls back to the
# broadcast-join path (the 100 TB shape, where centroids are a table).
CENTROID_LITERAL_CAP = 20_000


@dataclass
class KMeansResult:
    assignments: DataFrame  # (doc_id, cluster, dist2)
    centroids: dict[int, dict[str, float]]
    sse: dict[int, float]
    iterations: int
    converged: bool
    history: list[dict[int, float]] = field(default_factory=list)


def init_centroid_ids(n_docs: int, k: int, seed: int = 42) -> dict[int, int]:
    """Seeded draw of k distinct doc ids from 1..N -> {doc_id: cluster_idx}.

    Replaces the unseeded ``Random.longs(0, N+1)`` (JobExtractFeature.java:
    148-150) whose range includes the never-assigned id 0 (§8 Q5).
    """
    rng = random.Random(seed)
    ids = rng.sample(range(1, n_docs + 1), k)
    return {doc_id: idx for idx, doc_id in enumerate(ids)}


def _round10(x: float) -> float:
    """HALF_UP to 10dp, matching BigDecimal.setScale(10, HALF_UP)
    (ReducerKMean.java:50-52)."""
    import decimal

    return float(
        decimal.Decimal(repr(x)).quantize(decimal.Decimal("1e-10"), rounding=decimal.ROUND_HALF_UP)
    )


def kmeans(
    spark: SparkSession,
    features: DataFrame,
    k: int,
    max_iter: int,
    seed: int = 42,
    id_col: str = "doc_id",
    word_col: str = "word",
    weight_col: str = "weight",
    parity_max_iter_off_by_one: bool = True,
    max_centroid_entries: int = 1_000_000,
) -> KMeansResult:
    """Lloyd's algorithm on a sparse ``(doc_id, word, weight)`` table.

    ``parity_max_iter_off_by_one=True`` reproduces the reference's
    at-most-(m-1)-iterations loop (App.java:122-125; honest ``max_iter``
    when False).

    Memory envelope: each iteration materializes the new centroids —
    k × |active vocabulary| (word, weight) rows — on the DRIVER (the
    parity convergence test compares exact rounded maps). That is bounded
    for the reference's closed adjective vocabulary but a cliff for an
    open vocabulary, so the update refuses to collect more than
    ``max_centroid_entries`` rows (~50 MB at the default) and points at
    ``kmeans_ml``/``kmeans_fixedpoint``, whose centroids never leave the
    executors."""
    feats = features.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(word_col).alias("word"),
        F.col(weight_col).cast("double").alias("weight"),
    )
    feats = feats.localCheckpoint(eager=True)  # reused every iteration

    # Per-document sparse vector + ||x||^2, computed once. The entries
    # array feeds the literal-centroid assign (distances map-side, no
    # shuffle) and the centroid update; doc_norms feeds the join-based
    # assign fallback.
    # entries sorted by word: the literal-assign dot product folds over
    # this array, and a canonical fold order keeps dist2 ULP-identical
    # across runs/partitionings (collect_list order is shuffle luck)
    docs_vec = (
        feats.groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("word", "weight"))).alias("entries"),
            F.sum(F.col("weight") * F.col("weight")).alias("x2"),
        )
        .localCheckpoint(eager=True)
    )
    doc_norms = docs_vec.select("doc_id", "x2")

    n_docs, min_id, max_id = doc_norms.agg(
        F.count("*"), F.min("doc_id"), F.max("doc_id")
    ).head()
    if min_id == 1 and max_id == n_docs:
        # dense 1..N ids (the reference's own ETL contract,
        # ReducerExtractTransform.java:36-39): seeded draw over ids
        # directly — bit-compatible with the Python/numpy oracle
        id2cluster = init_centroid_ids(n_docs, k, seed)
    else:
        # sparse/arbitrary ids: the same seeded draw selects POSITIONS
        # 1..N, mapped to actual ids through a rank — otherwise sampled
        # ids can miss the data and clusters silently vanish at init
        from .etl import assign_sequential_ids

        # reuse the draw's OWN position->cluster mapping so cluster
        # numbering (and lowest-cluster tie-breaks) is identical whether
        # ids are dense 1..N or sparse — rebuilding it from
        # sorted(positions) renumbered clusters differently per path
        pos2cluster = init_centroid_ids(n_docs, k, seed)
        ranked = assign_sequential_ids(
            doc_norms.select("doc_id"), ["doc_id"], id_col="_pos"
        )
        id2cluster = {
            r["doc_id"]: pos2cluster[r["_pos"]]
            for r in ranked.filter(F.col("_pos").isin(list(pos2cluster))).collect()
        }
    seed_ids = local_df(
        spark, [(d, c) for d, c in id2cluster.items()], "doc_id long, cluster int"
    )
    centroids_df = feats.join(F.broadcast(seed_ids), "doc_id").select(
        "cluster", "word", F.col("weight").alias("cweight")
    )
    centroids = _collect_centroids(centroids_df)

    limit = max_iter - 1 if parity_max_iter_off_by_one else max_iter
    history: list[dict[int, float]] = []
    converged = False
    iterations = 0
    assignments = None

    for _ in range(max(limit, 0)):
        iterations += 1
        # localCheckpoint: assignments feed three aggregations + the next
        # iteration; pin them once instead of recomputing the join, and cut
        # lineage so plan depth stays O(1) across iterations.
        if sum(len(v) for v in centroids.values()) <= CENTROID_LITERAL_CAP:
            # small centroids: distances computed map-side against literal
            # maps — the whole assign pass is shuffle-free, and the update
            # explodes the already-assigned vectors (one shuffle total)
            assigned = _assign_literal(docs_vec, centroids).localCheckpoint(eager=True)
            assignments = assigned.select("doc_id", "cluster", "dist2")
            new_rows = (
                assigned.select("cluster", F.explode("entries").alias("e"))
                .groupBy("cluster", F.col("e.word").alias("word"))
                .agg(F.sum("e.weight").alias("wsum"))
            )
        else:
            assignments = _assign(spark, feats, doc_norms, centroids).localCheckpoint(
                eager=True
            )
            new_rows = (
                feats.join(assignments.select("doc_id", "cluster"), "doc_id")
                .groupBy("cluster", "word")
                .agg(F.sum("weight").alias("wsum"))
            )
        # one aggregation job for sizes + SSE (k rows collected)
        stats = assignments.groupBy("cluster").agg(
            F.count("*").alias("n"), F.sum("dist2").alias("sse")
        ).collect()
        sizes = {r["cluster"]: r["n"] for r in stats}
        sse = {r["cluster"]: r["sse"] for r in stats}
        history.append(sse)
        new_centroid_rows = new_rows.limit(max_centroid_entries + 1).collect()
        if len(new_centroid_rows) > max_centroid_entries:
            raise RuntimeError(
                f"k-means centroid update exceeds max_centroid_entries="
                f"{max_centroid_entries} (k x |active vocab| rows collected to "
                "the driver for the parity convergence test). For open "
                "vocabularies use kmeans_ml or kmeans_fixedpoint, whose "
                "centroids stay distributed."
            )
        new_centroids: dict[int, dict[str, float]] = {}
        for row in new_centroid_rows:
            c = row["cluster"]
            new_centroids.setdefault(c, {})[row["word"]] = _round10(
                row["wsum"] / sizes[c]
            )
        # O37 convergence: exact equality of rounded maps; only clusters
        # present in the OLD map are checked (JobClustering.java:229-231),
        # and empty clusters disappear.
        if _converged(centroids, new_centroids):
            centroids = new_centroids
            converged = True
            break
        centroids = new_centroids

    if assignments is None:  # max_iter <= 1: parity loop never runs
        assignments = _assign(spark, feats, doc_norms, centroids)
        sse = {
            r["cluster"]: r["sse"]
            for r in assignments.groupBy("cluster").agg(F.sum("dist2").alias("sse")).collect()
        }
    else:
        sse = history[-1]
    return KMeansResult(
        assignments=assignments,
        centroids=centroids,
        sse=sse,
        iterations=iterations,
        converged=converged,
        history=history,
    )


def kmeans_fixedpoint(
    weights: DataFrame,
    k: int = 5,
    n_assign_passes: int = 2,
    id_col: str = "doc_id",
    word_col: str = "word",
    weight_col: str = "w_e4",
    output: str = "summary",
    assign_kernel: str = "auto",
    persist_weights: bool = True,
) -> DataFrame:
    """Oracle-exact Lloyd over FIXED-POINT features — every number in the
    whole algorithm is an int64, so a SQL oracle (DuckDB) reproduces it
    bit-for-bit with zero float hazards. Semantics:

    - input weights are e4-scaled integers (``round(w * 10^4)``);
    - init: the k documents with the smallest ``(md5(doc_id), doc_id)``
      become centroids 0..k-1 (engine-portable replacement for the seeded
      RNG draw of the parity path — JobExtractFeature.java:143-158 O26 —
      which no SQL engine can replay);
    - distances: dist2_e8 = ||x||² + ||c||² − 2·x·c over the scaled ints
      (exact, order-independent — integer addition commutes, unlike the
      float sums the parity path uses);
    - argmin tie-break: lowest cluster index (O32);
    - update: per-(cluster, word) mean rounded HALF_UP at e4 via pure
      integer arithmetic ``(2·s + n) div (2·n)`` (the O33 rounding rule,
      at e4 instead of 10dp); zero entries dropped (no effect on dist);
    - fixed ``n_assign_passes`` assignment passes (no convergence test —
      deterministic work, same every run);
    - returns the per-cluster summary (cluster, n_members, sse_e8) of the
      LAST assignment pass.

    Scale: centroids (k × active vocab) travel as a broadcast table; per
    pass the docs shuffle once for the dot-product groupBy and once for
    the update groupBy, both map-side partial-aggregated. No centroid
    VECTOR ever materializes on the driver; the bounded collects are the
    k-row seed pick and (pivot kernel) the k-long ‖c‖² table.

    ``assign_kernel``: ``"pivot"`` computes each pass's per-cluster dots
    as ONE groupBy(doc_id).pivot(cluster) aggregation and the argmin as
    a row expression (k columns wide — right up to a few thousand
    clusters); ``"join"`` keeps the (doc_id, cluster)-keyed join form
    for huge k. ``"auto"`` picks pivot at k ≤ 256. Both are bit-equal
    (pinned by test).

    ``persist_weights=True`` (the default) registers a
    MEMORY_AND_DISK cache of the weights projection. For the
    ``summary`` and ``assignments`` outputs the cache is RELEASED
    before returning (both materialize their result eagerly — k rows /
    an eager checkpoint — so the last cache consumer is known; no net
    persisted blocks survive the call, pinned by test). Only
    ``assignments_lazy`` keeps the cache for the session (its whole
    point is deferring the Lloyd chain into the single consumer's first
    action, so the last consumer is unknowable here): long-lived
    sessions cycling many corpora through that mode should
    ``spark.catalog.clearCache()`` between runs, or pass
    ``persist_weights=False`` when the caller already caches the
    (doc_id, word, weight) projection itself."""
    # feeds seeds, norms, and every pass. persist (not an eager
    # localCheckpoint): the first action — pass 0's seed-rows collect —
    # materializes the cache as a side effect, so the dedicated
    # checkpoint job (plus its plan->RDD conversion of the whole input)
    # disappears from the chain; every later consumer reads the
    # in-memory columnar blocks. MEMORY_AND_DISK so a huge weights table
    # spills instead of recomputing the upstream TF-IDF per pass.
    # Lifetime: released before returning on the summary/assignments
    # outputs (their results materialize eagerly, so the last cache
    # consumer is known — round-9 verdict); session-lifetime only on
    # assignments_lazy, see the docstring.
    from pyspark import StorageLevel

    w = weights.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(word_col).alias("word"),
        F.col(weight_col).cast("long").alias("w"),
    )
    if persist_weights:
        w = w.persist(StorageLevel.MEMORY_AND_DISK)

    spark = weights.sparkSession
    pivot = assign_kernel == "pivot" or (assign_kernel == "auto" and k <= 256)
    cent_schema = T.StructType(
        [
            T.StructField("cluster", T.IntegerType()),
            w.schema["word"],
            T.StructField("cw", T.LongType()),
        ]
    )
    seed_pick = (
        w.select("doc_id")
        .distinct()
        .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        .limit(k)
    )
    # `collected`: the CURRENT centroid table as local (cluster, word,
    # cw) rows when it is known small — the pivot fast path (see the
    # pass loop). Seeding collects the k seed docs' weight ROWS in one
    # job and derives the (md5, doc_id) seed order driver-side with the
    # identical rule (hashlib md5 of the decimal string == Spark
    # md5(cast as string)) — folding the old separate seed-id collect
    # into pass 0's centroid collect.
    collected: list[tuple] | None = None
    probe_small = True  # once a probe comes back oversize, stop probing:
    # the centroid table stays ~k x active-vocab rows across passes, so
    # a second probe would just re-run the chain and discard it again
    cent = None
    if pivot:
        rows0 = w.join(seed_pick, "doc_id").limit(_CENT_COLLECT_MAX + 1).collect()
        if len(rows0) > _CENT_COLLECT_MAX:
            probe_small = False
        else:
            import hashlib

            order = sorted(
                {int(r["doc_id"]) for r in rows0},
                key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d),
            )
            cl = {d: i for i, d in enumerate(order)}
            collected = [
                (cl[int(r["doc_id"])], r["word"], int(r["w"])) for r in rows0
            ]
    if collected is None:
        seed_rows = seed_pick.collect()
        seed_df = local_df(
            spark,
            [(r["doc_id"], i) for i, r in enumerate(seed_rows)],
            "doc_id long, cluster int",
        )
        cent = w.join(F.broadcast(seed_df), "doc_id").select(
            "cluster", "word", F.col("w").alias("cw")
        )
    # lineage cuts only pay for themselves on DEEP loops: each lazy
    # localCheckpoint costs real RDD-conversion time (measured ~0.5-1s
    # total at sf0.1) while Catalyst's ReusedExchange already serves the
    # repeated d2/cent subtrees from one shuffle when the plan is
    # shallow — same finding as components.pagerank_e8
    deep = n_assign_passes > 4
    d2 = w.groupBy("doc_id").agg(F.sum(F.col("w") * F.col("w")).alias("x2"))
    if deep:
        d2 = d2.localCheckpoint(eager=False)  # cached at first use, reused per pass

    assign = None
    for p in range(max(n_assign_passes, 1)):
        if pivot:
            # the cent chain has multiple consumers per pass (||c||^2,
            # the dot pivot, and the pass-final action). When the k x
            # active-vocab table is SMALL, one limit-guarded collect
            # replaces BOTH the eager checkpoint job and the pivot
            # kernel's ||c||^2 collect job: centroids become a literal
            # broadcast DataFrame and ||c||^2 exact Python ints
            # (bit-equal - same rows, same integer arithmetic; measured
            # 2 jobs/pass off kmeans_documents at sf0.1, plus the
            # seed-id job folded into pass 0's collect). Past the cap
            # the checkpoint form stands (k x vocab can be millions of
            # rows at huge vocab - never collect unbounded state).
            if collected is None and probe_small:
                rows = cent.limit(_CENT_COLLECT_MAX + 1).collect()
                if len(rows) > _CENT_COLLECT_MAX:
                    probe_small = False
                else:
                    collected = [
                        (int(r["cluster"]), r["word"], int(r["cw"])) for r in rows
                    ]
            if collected is not None:
                cent = local_df(spark, collected, cent_schema)
                c2: dict[int, int] = {}
                for c, _word, cw in collected:
                    c2[c] = c2.get(c, 0) + cw * cw
                assign = _assign_fixedpoint_pivot(w, d2, cent, c2=c2)
            else:
                cent = cent.localCheckpoint(eager=True)
                assign = _assign_fixedpoint_pivot(w, d2, cent)
        else:
            assign = _assign_fixedpoint(w, d2, cent)
        if p == n_assign_passes - 1:
            break
        if deep:
            assign = assign.localCheckpoint(eager=False)  # feeds sizes + update
        csize = assign.groupBy("cluster").agg(F.count("*").alias("n"))
        cent = (
            w.join(assign.select("doc_id", "cluster"), "doc_id")
            .groupBy("cluster", "word")
            .agg(F.sum("w").alias("s"))
            .join(F.broadcast(csize), "cluster")
            .select(
                "cluster",
                "word",
                # DIV truncates toward zero in BOTH engines (Spark DIV and
                # DuckDB // agree on negatives — verified), so the rounded
                # mean is engine-exact for signed features too
                F.expr("(2 * s + n) DIV (2 * n)").cast("long").alias("cw"),
            )
            # drop exact zeros only — they contribute nothing to c2 or the
            # dot join; negative weights (dense signed features, e.g.
            # embeddings) must survive (!= 0, not > 0; identical on the
            # nonnegative TF-IDF path)
            .filter(F.col("cw") != 0)
        )
        collected = None  # the update chain invalidates the local rows
        if deep:
            cent = cent.localCheckpoint(eager=False)  # cut per-iteration lineage
    if output == "assignments":
        # (doc_id, cluster, dist2) of the LAST pass — the input to
        # cluster-scoped downstream work (SemDeDup-style within-cluster
        # pair generation, cluster-balanced sampling). EAGERLY
        # checkpointed: consumers typically self-join the assignments
        # (pair generation), and a lazy checkpoint would run the whole
        # Lloyd chain once per branch inside their first job
        try:
            out = assign.localCheckpoint(eager=True)
        finally:
            if persist_weights:
                # the eager checkpoint was this cache's last consumer —
                # release the blocks now instead of leaking them for the
                # session (round-9 verdict); finally so an executor loss
                # or OOM during the materializing job can't leak the
                # cache either (round-10 verdict #3)
                w.unpersist()
        return out
    if output == "assignments_lazy":
        # same table, returned as the RAW lazy plan — for SINGLE-consumer
        # chains (e.g. cluster labeling joins the assignments once): the
        # consumer's first action runs the Lloyd chain inline exactly
        # once, so a checkpoint handle here bought nothing and cost a
        # full plan->RDD conversion (~0.7s of driver time at sf0.1,
        # cProfile-verified — dropped in optimization round 12). The
        # single-consumer contract is the caller's: a caller that fans
        # the result into several actions should checkpoint it itself.
        # persist_weights=True in THIS mode is the one session-lifetime
        # cache left (the last consumer is unknowable here) — the
        # docstring tells such callers to clearCache()/unpersist
        # themselves.
        return assign
    summary = (
        assign.groupBy("cluster")
        .agg(
            F.count("*").cast("bigint").alias("n_members"),
            F.sum("dist2").cast("bigint").alias("sse_e8"),
        )
        .orderBy("cluster")
    )
    if persist_weights:
        # k rows — materialize them eagerly so the weights cache can be
        # released before returning: the one extra "job" is the same
        # Lloyd chain the caller's first action was about to run, now
        # feeding a k-row checkpoint instead of leaking a corpus-sized
        # cache for the session (round-9 verdict); finally so a failing
        # materialization can't leak the cache (round-10 verdict #3)
        try:
            summary = summary.localCheckpoint(eager=True)
        finally:
            w.unpersist()
    return summary


_CENT_COLLECT_MAX = 65536  # centroid rows a driver collect may hold


def _assign_fixedpoint_pivot(
    w: DataFrame, d2: DataFrame, cent: DataFrame, c2: dict[int, int] | None = None
) -> DataFrame:
    """Pivot-form of the fixed-point assignment: ONE groupBy(doc_id)
    pivot produces every per-cluster dot as a column, then the argmin is
    a pure row expression over literal ‖c‖² values — replacing the
    (doc_id, cluster)-keyed shuffle + (doc_id, cluster) join + argmin
    groupBy of the join form with a single doc-keyed shuffle.

    The k-row ‖c‖² collect is bounded (k longs) and the only driver
    materialization beyond the seed pick; candidate clusters are exactly
    the clusters present in ``cent`` (an empty cluster is NOT a
    candidate — same contract as the join form's c2 cross join). Integer
    arithmetic is identical to the join form, so results are bit-equal
    (pinned by test). Right for k up to a few thousand (pivot width = k
    columns); the join form remains the huge-k path.

    ``c2`` lets the caller hand in the per-cluster ||c||^2 ints it
    already derived from a collected centroid table (the small-cent
    fast path in :func:`kmeans_fixedpoint`) — skipping this kernel's
    own collect job; values must equal the aggregate exactly (exact
    Python int arithmetic over the same rows guarantees it)."""
    if c2 is None:
        c2_rows = (
            cent.groupBy("cluster")
            .agg(F.sum(F.col("cw") * F.col("cw")).alias("c2"))
            .collect()
        )
        c2 = {int(r["cluster"]): int(r["c2"]) for r in c2_rows}
    clusters = sorted(c2)
    dots = (
        w.join(F.broadcast(cent), "word")
        .groupBy("doc_id")
        .pivot("cluster", clusters)
        .agg(F.sum(F.col("w") * F.col("cw")))
    )
    joined = d2.join(dots, "doc_id", "left")
    cands = [
        F.struct(
            (
                F.col("x2")
                + F.lit(c2[c])
                - 2 * F.coalesce(F.col(f"`{c}`"), F.lit(0).cast("long"))
            ).alias("dist2"),
            F.lit(c).cast("int").alias("cluster"),
        )
        for c in clusters
    ]
    best = F.array_min(F.array(*cands))
    return joined.select(
        "doc_id",
        best["cluster"].alias("cluster"),
        best["dist2"].alias("dist2"),
    )


def _assign_fixedpoint(w: DataFrame, d2: DataFrame, cent: DataFrame) -> DataFrame:
    """(doc_id, cluster, dist2) — exact-integer nearest-centroid pass.

    Same sparse expansion as ``_assign`` (dot via word join, missing
    pairs via the k-row cross join) but everything stays int64; dist2 is
    exactly Σ_union (w−c)², hence never negative — no clamp."""
    c2 = cent.groupBy("cluster").agg(F.sum(F.col("cw") * F.col("cw")).alias("c2"))
    dots = (
        w.join(F.broadcast(cent), "word")
        .groupBy("doc_id", "cluster")
        .agg(F.sum(F.col("w") * F.col("cw")).alias("dot"))
    )
    dist = (
        d2.crossJoin(F.broadcast(c2))
        .join(dots, ["doc_id", "cluster"], "left")
        .select(
            "doc_id",
            "cluster",
            (
                F.col("x2") + F.col("c2") - 2 * F.coalesce(F.col("dot"), F.lit(0).cast("long"))
            ).alias("dist2"),
        )
    )
    best = dist.groupBy("doc_id").agg(
        F.min_by(F.struct("cluster", "dist2"), F.struct("dist2", "cluster")).alias("b")
    )
    return best.select(
        "doc_id", F.col("b.cluster").alias("cluster"), F.col("b.dist2").alias("dist2")
    )


def _probe_lists(w: DataFrame, d2: DataFrame, g: DataFrame, n_probe: int) -> DataFrame:
    """(doc_id, m): each doc's ``n_probe`` nearest coarse lists under the
    exact fixed-point key x2 + g2 − 2·dot, ties to the lowest list id —
    the same integer discipline as ``_assign_fixedpoint``, but keeping
    the TOP-n_probe lists instead of the argmin. The dot join expands to
    n·d·c rows with c = |lists| (the whole point: c ~ sqrt(k), never k)."""
    g2 = g.groupBy("m").agg(F.sum(F.col("gw") * F.col("gw")).alias("g2"))
    dots = (
        w.join(F.broadcast(g), "word")
        .groupBy("doc_id", "m")
        .agg(F.sum(F.col("w") * F.col("gw")).alias("dot"))
    )
    keyed = (
        d2.crossJoin(F.broadcast(g2))
        .join(dots, ["doc_id", "m"], "left")
        .select(
            "doc_id",
            "m",
            (
                F.col("x2") + F.col("g2") - 2 * F.coalesce(F.col("dot"), F.lit(0).cast("long"))
            ).alias("key"),
        )
    )
    rn = F.row_number().over(Window.partitionBy("doc_id").orderBy("key", "m"))
    return keyed.withColumn("_rn", rn).filter(F.col("_rn") <= n_probe).select("doc_id", "m")


# Fine-codebook (k×d cells) closure bound for the fused assignment
# kernel: 4e6 float64 cells ≈ 32 MB serialized — generous for the local
# profile (400×64 at sf1.0) yet conservative for executors; past it the
# scoring stays a distributed join (the codebook grows with the corpus).
_FUSED_MAX_CELLS = 4_000_000


def _probe_lists_numpy(
    dense: DataFrame, g_rows: list, n_probe: int, vec_col: str = "vec"
) -> DataFrame:
    """Arrow/numpy twin of :func:`_probe_lists` over the DENSE vector
    form: per batch, quantize to e4 (``_round_half_away(x·1e4)`` — the
    same double path as ``e_int``), one matmul against the coarse
    codebook, rank by key = g2 − 2·dot with a stable argsort (ties →
    the lower list id, G rows ordered by m ascending). The x2 term of
    the join form's key is constant per doc, so the ranking is
    IDENTICAL (pinned by test); every product is an integer below 2^53,
    exact in float64.

    Why this exists: the join form expands n·d·c rows per pass through
    a hash aggregate — the dominant stage of the hierarchical
    assignment (measured 10.6s of 26s at sf1.0). Here it is one
    (batch × d) @ (d × c) matmul. The codebook rides in the closure:
    c×d e4 ints with c ~ sqrt(2k) — ~17 MB even at k = 2×10⁷, so the
    closure stays broadcast-safe at any realistic corpus."""
    import numpy as np

    from pyspark.sql import types as T

    from .similarity import _round_half_away

    ms = sorted({int(r["m"]) for r in g_rows})
    width = max(int(r["word"]) for r in g_rows) + 1
    G = np.zeros((len(ms), width), dtype=np.float64)
    midx = {m: i for i, m in enumerate(ms)}
    for r in g_rows:
        G[midx[int(r["m"])], int(r["word"])] = float(r["gw"])
    g2 = (G * G).sum(axis=1)  # exact: e4² ints < 2^53
    ms_arr = np.array(ms, dtype=np.int32)
    take = min(n_probe, len(ms))

    def probe(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = _round_half_away(
                np.vstack(pdf[vec_col].map(lambda v: np.asarray(v, dtype=np.float64)))
                * 10000.0
            )
            keys = g2 - 2.0 * (X[:, :width] @ G.T)  # zero-dropped cols beyond width
            # stable argsort == (key, m) tie-break (columns are m-ascending)
            order = np.argsort(keys, axis=1, kind="stable")[:, :take]
            import pandas as pd

            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(pdf["doc_id"].to_numpy(), take),
                    "m": ms_arr[order].reshape(-1),
                }
            )

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("m", T.IntegerType())]
    )
    return dense.mapInPandas(probe, schema)


def _np_trunc_div(a, b):
    """Integer division truncating toward ZERO — numpy's ``//`` floors
    (differs on negatives), while Spark's DIV and DuckDB's ``//`` both
    truncate; signed centroid sums make the distinction load-bearing."""
    import numpy as np

    return np.sign(a) * np.sign(b) * (np.abs(a) // np.abs(b))


def _coarse_model_numpy(f0_rows: list, n_list: int):
    """Driver-side exact-int replica of the coarse-quantizer chain over
    the COLLECTED fine seed vectors (k×d rows — the same payload the
    fused kernel already holds in its closure, so no new scale bound):
    md5-min coarse seeds → one assignment pass → (2s+n) trunc-div
    update → final quantization of the seeds. Returns
    (g_rows, cmap1_rows) shaped like the distributed path's collects —
    BIT-IDENTICAL to the join-form/SQL chain (pinned by the kernel
    parity + degenerate==exact tests): int64 matmuls (products < 2^63),
    (key, id) tie-breaks via first-hit argmin over id-ascending
    columns, zero-dropped rows excluded from candidacy exactly as the
    SQL's ``WHERE gw <> 0`` does. Exists purely to delete ~6 tiny
    Spark jobs per clustering (the measured fixed floor at small SF —
    the coarse chain is k-row work that never needed a cluster)."""
    import hashlib

    import numpy as np

    js = sorted({int(r["cluster"]) for r in f0_rows})
    width = max(int(r["word"]) for r in f0_rows) + 1
    jidx = {j: i for i, j in enumerate(js)}
    S = np.zeros((len(js), width), dtype=np.int64)
    for r in f0_rows:
        S[jidx[int(r["cluster"])], int(r["word"])] = int(r["cw"])
    x2 = (S * S).sum(axis=1)
    cseeds = sorted(js, key=lambda j: (hashlib.md5(str(j).encode()).hexdigest(), j))[
        : min(n_list, len(js))
    ]
    G0 = S[[jidx[j] for j in cseeds]]
    # candidacy mirrors the join form: a list is a candidate only if its
    # centroid has >= 1 nonzero weight (zero rows never reach cent/g)
    cand0 = [m for m in range(len(cseeds)) if G0[m].any()]
    g02 = (G0 * G0).sum(axis=1)
    keys0 = x2[:, None] + g02[None, cand0] - 2 * (S @ G0[cand0].T)
    ca1 = np.array(cand0)[np.argmin(keys0, axis=1)]  # first hit = lowest m
    G = np.zeros((len(cseeds), width), dtype=np.int64)
    nonempty = []
    for m in set(int(v) for v in ca1):
        members = S[ca1 == m]
        n = members.shape[0]
        s = members.sum(axis=0)
        gw = _np_trunc_div(2 * s + n, np.int64(2 * n))
        G[m] = gw
        if gw.any():
            nonempty.append(m)
    nonempty = sorted(nonempty)
    g2 = (G * G).sum(axis=1)
    keys1 = x2[:, None] + g2[None, nonempty] - 2 * (S @ G[nonempty].T)
    cmap1 = np.array(nonempty)[np.argmin(keys1, axis=1)]
    g_rows = [
        {"m": m, "word": w, "gw": int(G[m, w])}
        for m in nonempty
        for w in np.nonzero(G[m])[0]
    ]
    cmap1_rows = [{"cluster": int(j), "m": int(m)} for j, m in zip(js, cmap1)]
    return g_rows, cmap1_rows, G, g2, nonempty


def _quantize_rows_numpy(cent_rows: list, G, g2, nonempty: list) -> list:
    """Driver-side pass-2 re-quantization: assign each (collected) fine
    centroid to its nearest nonempty coarse list under the same int64
    key and tie-break — the cmap2 stage without a Spark job."""
    import numpy as np

    js = sorted({int(r["cluster"]) for r in cent_rows})
    width = G.shape[1]
    jidx = {j: i for i, j in enumerate(js)}
    C = np.zeros((len(js), width), dtype=np.int64)
    extra = 0
    for r in cent_rows:
        w = int(r["word"])
        if w < width:
            C[jidx[int(r["cluster"])], w] = int(r["cw"])
        else:
            extra += 1  # word beyond G's width: dot term is 0 anyway
    x2 = (C * C).sum(axis=1)
    if extra:
        # x2 must still count out-of-width coords (they square into x2
        # even though they never meet a nonzero G column)
        for r in cent_rows:
            if int(r["word"]) >= width:
                x2[jidx[int(r["cluster"])]] += int(r["cw"]) ** 2
    keys = x2[:, None] + g2[None, nonempty] - 2 * (C @ G[nonempty].T)
    ms = np.array(nonempty)[np.argmin(keys, axis=1)]
    return [{"cluster": int(j), "m": int(m)} for j, m in zip(js, ms)]


def _assign_fused_numpy(
    dense: DataFrame,
    g_rows: list,
    cent_rows: list,
    cmap_rows: list,
    n_probe: int,
    vec_col: str = "vec",
) -> DataFrame:
    """One-pass Arrow/numpy form of probe-then-score: per batch, ONE
    matmul ranks the coarse lists (stable argsort = (key, m) tie-break),
    then for each probed list one matmul scores ONLY its fine centroids
    and the per-doc argmin runs over the probed lists' bests — emitting
    (doc_id, cluster, dist2) directly. Zero shuffles for a whole
    assignment pass (the join form pays a word-join hash aggregate plus
    a window per pass); both codebooks ride the closure. Bit-identical
    to the join form (pinned by test): e4 quantization via
    ``_round_half_away(x·1e4)`` = ``e_int``; every key is
    x2 + c2 − 2·dot over ints < 2^53, exact in float64; per-list argmin
    takes the FIRST minimum over j-ascending rows and the cross-list
    reduce breaks ties by (dist2, j) — together the global (dist2, j)
    rule.

    Closure scale bound: the fine codebook is k×d values — fine for
    k = n/target at the measured SFs (400×64 at sf1.0) and far beyond,
    but k grows with the corpus, so :func:`kmeans_fixedpoint_ivf` only
    picks this kernel under ``_FUSED_MAX_CELLS`` and falls back to the
    distributed join scoring above it."""
    import numpy as np

    from pyspark.sql import types as T

    from .similarity import _round_half_away

    ms = sorted({int(r["m"]) for r in g_rows})
    width = max(
        max(int(r["word"]) for r in g_rows),
        max(int(r["word"]) for r in cent_rows),
    ) + 1
    G = np.zeros((len(ms), width), dtype=np.float64)
    midx = {m: i for i, m in enumerate(ms)}
    for r in g_rows:
        G[midx[int(r["m"])], int(r["word"])] = float(r["gw"])
    g2 = (G * G).sum(axis=1)
    # fine centroids grouped by their coarse list, j-ascending inside
    by_list_js: dict[int, list[int]] = {}
    j2m = {int(r["cluster"]): int(r["m"]) for r in cmap_rows}
    cent: dict[int, dict[int, float]] = {}
    for r in cent_rows:
        cent.setdefault(int(r["cluster"]), {})[int(r["word"])] = float(r["cw"])
    for j in sorted(j2m):
        by_list_js.setdefault(j2m[j], []).append(j)
    F_by_list: dict[int, tuple] = {}
    for m, js in by_list_js.items():
        Fm = np.zeros((len(js), width), dtype=np.float64)
        for i, j in enumerate(js):
            for word, cw in cent.get(j, {}).items():
                Fm[i, word] = cw
        F_by_list[m] = (np.array(js, dtype=np.int32), Fm, (Fm * Fm).sum(axis=1))
    probe_ms = np.array(sorted(F_by_list), dtype=np.int32)  # nonempty lists only
    sel = np.array([midx[m] for m in probe_ms])
    take = min(n_probe, len(probe_ms))

    def assign(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = _round_half_away(
                np.vstack(pdf[vec_col].map(lambda v: np.asarray(v, dtype=np.float64)))
                * 10000.0
            )
            Xw = X[:, :width] if X.shape[1] >= width else np.pad(
                X, ((0, 0), (0, width - X.shape[1]))
            )
            x2 = (X * X).sum(axis=1)
            keys = g2[sel] - 2.0 * (Xw @ G[sel].T)
            order = np.argsort(keys, axis=1, kind="stable")[:, :take]
            probed = probe_ms[order]  # (n_b, take)
            best_d = np.full(len(pdf), np.inf)
            best_j = np.full(len(pdf), np.iinfo(np.int32).max, dtype=np.int64)
            for m in np.unique(probed):
                rows = np.nonzero((probed == m).any(axis=1))[0]
                js, Fm, c2 = F_by_list[int(m)]
                d = x2[rows, None] + c2[None, :] - 2.0 * (Xw[rows] @ Fm.T)
                loc = np.argmin(d, axis=1)  # first min = lowest j (j-ascending)
                dmin = d[np.arange(len(rows)), loc]
                jmin = js[loc].astype(np.int64)
                upd = (dmin < best_d[rows]) | (
                    (dmin == best_d[rows]) & (jmin < best_j[rows])
                )
                ridx = rows[upd]
                best_d[ridx] = dmin[upd]
                best_j[ridx] = jmin[upd]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "cluster": best_j.astype(np.int32),
                    "dist2": best_d.astype(np.int64),
                }
            )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("cluster", T.IntegerType()),
            T.StructField("dist2", T.LongType()),
        ]
    )
    return dense.mapInPandas(assign, schema)


def _assign_via_probes(
    w: DataFrame, d2: DataFrame, cent: DataFrame, probes: DataFrame, cmap: DataFrame
) -> DataFrame:
    """(doc_id, cluster, dist2): exact fixed-point argmin over ONLY the
    fine clusters whose coarse list the doc probes — candidate pairs are
    probes ⋈ cmap (fine cluster → coarse list), so per-doc work is
    n_probe·k/c fine centroids instead of k. Missing dots/norms coalesce
    to 0 exactly as in ``_assign_fixedpoint`` (a candidate stays a
    candidate even when its centroid shares no nonzero word with the
    doc)."""
    cand = probes.join(F.broadcast(cmap), "m").select("doc_id", "cluster")
    c2 = cent.groupBy("cluster").agg(F.sum(F.col("cw") * F.col("cw")).alias("c2"))
    dots = (
        cand.join(w, "doc_id")
        .join(F.broadcast(cent), ["cluster", "word"])
        .groupBy("doc_id", "cluster")
        .agg(F.sum(F.col("w") * F.col("cw")).alias("dot"))
    )
    dist = (
        cand.join(d2, "doc_id")
        .join(F.broadcast(c2), "cluster", "left")
        .join(dots, ["doc_id", "cluster"], "left")
        .select(
            "doc_id",
            "cluster",
            (
                F.col("x2")
                + F.coalesce(F.col("c2"), F.lit(0).cast("long"))
                - 2 * F.coalesce(F.col("dot"), F.lit(0).cast("long"))
            ).alias("dist2"),
        )
    )
    best = dist.groupBy("doc_id").agg(
        F.min_by(F.struct("cluster", "dist2"), F.struct("dist2", "cluster")).alias("b")
    )
    return best.select(
        "doc_id", F.col("b.cluster").alias("cluster"), F.col("b.dist2").alias("dist2")
    )


def _centroid_update(w: DataFrame, assign: DataFrame) -> DataFrame:
    """Per-(cluster, word) rounded-int mean over the assignment — the
    O33 HALF_UP rule ``(2s + n) div (2n)``, exact zeros dropped. The one
    linear stage of a Lloyd pass (identical to the loop body of
    :func:`kmeans_fixedpoint`)."""
    csize = assign.groupBy("cluster").agg(F.count("*").alias("n"))
    return (
        w.join(assign.select("doc_id", "cluster"), "doc_id")
        .groupBy("cluster", "word")
        .agg(F.sum("w").alias("s"))
        .join(F.broadcast(csize), "cluster")
        .select(
            "cluster",
            "word",
            F.expr("(2 * s + n) DIV (2 * n)").cast("long").alias("cw"),
        )
        .filter(F.col("cw") != 0)
    )


def _fused_chain(
    w: DataFrame, dense: DataFrame, f0_rows: list, n_list: int, n_probe: int
) -> tuple[DataFrame, dict]:
    """The fused-kernel hierarchical chain, returning the final
    assignments AND the trained model — the coarse codebook G, the
    final fine centroids (c1), and the fine→coarse map (cmap2) — so a
    LATER batch can be quantized through the same model without
    re-clustering (the incremental-dedup shape). Assignments are
    eagerly checkpointed."""
    g_rows, cmap1_rows, G, g2v, nonempty = _coarse_model_numpy(f0_rows, n_list)
    # a1 has exactly ONE consumer — the centroid-update collect right
    # below — so its former eager checkpoint was a dedicated
    # materialization job plus a plan->RDD conversion for nothing
    # (optimization round 12); pass 2 reads only the COLLECTED c1 rows,
    # never a1 itself
    a1 = _assign_fused_numpy(dense, g_rows, f0_rows, cmap1_rows, n_probe)
    c1_rows = _centroid_update(w, a1).collect()
    cmap2_rows = _quantize_rows_numpy(c1_rows, G, g2v, nonempty)
    a2 = _assign_fused_numpy(dense, g_rows, c1_rows, cmap2_rows, n_probe)
    model = {
        "kind": "fused",
        "g_rows": g_rows,
        "cent_rows": c1_rows,
        "cmap_rows": cmap2_rows,
        "n_probe": n_probe,
    }
    # lazy: consumers self-join the assignments, but the caller's first
    # action materializes the checkpoint once for both branches — the
    # dedicated eager job was pure overhead (round 12, same reasoning
    # as the round-11 connected-components change)
    return a2.localCheckpoint(eager=False), model


def kmeans_fixedpoint_ivf_model(
    weights: DataFrame,
    k: int,
    n_list: int | None = None,
    n_probe: int = 2,
    id_col: str = "doc_id",
    word_col: str = "word",
    weight_col: str = "w_e4",
    dense: DataFrame | None = None,
    max_fused_cells: int | None = None,
) -> tuple[DataFrame, dict]:
    """:func:`kmeans_fixedpoint_ivf` with the trained model EXPOSED:
    returns (assignments, model) where the model quantizes later
    batches via :func:`assign_with_model` without re-clustering — the
    incremental-dedup shape (train on the corpus once, route every
    arriving batch through the same lists). Requires the dense form.

    The model has TWO tiers, auto-picked by the same closure bound the
    batch path uses (``max_fused_cells``, default ``_FUSED_MAX_CELLS``)
    and pinned bit-identical across the boundary by test:

    - **fused** (k×dim within the bound): both codebooks ride the
      model dict as collected rows; a batch assignment is ONE
      mapInPandas pass (streaming-safe — the streaming SemDeDup twin
      serves through this tier).
    - **distributed** (past the bound — the 100 TB shape, where
      k = n/target outgrows any closure): the model holds the fine
      centroid and fine→coarse map as eagerly-checkpointed DataFrames
      plus the c×d coarse codebook rows (c ~ sqrt(2k) — bounded at any
      scale); :func:`assign_with_model` routes batches through the
      numpy coarse probes + the distributed join-scoring tier, exactly
      the batch path's own fallback ladder. Batch-only: the join
      scorer aggregates over a self-derived long form, which a
      micro-batch stream cannot express without watermarked
      stream-stream joins."""
    if dense is None:
        raise ValueError("kmeans_fixedpoint_ivf_model requires the dense form")
    return kmeans_fixedpoint_ivf(
        weights, k, n_list=n_list, n_probe=n_probe, id_col=id_col,
        word_col=word_col, weight_col=weight_col, dense=dense,
        _want_model=True, _max_fused_cells=max_fused_cells,
    )


def assign_with_model(dense: DataFrame, model: dict) -> DataFrame:
    """(doc_id, cluster, dist2): quantize NEW vectors through an
    already-trained hierarchical model
    (:func:`kmeans_fixedpoint_ivf_model`'s output) — the trained
    centroids never move. A ``fused`` model runs one mapInPandas pass
    (both codebooks in the closure); a ``distributed`` model (large k —
    the codebook outgrew the closure bound) probes coarse lists with
    the numpy kernel and scores fine candidates with the distributed
    join tier, bit-identical to the fused route (pinned by test). This
    is the write-time shape incremental pipelines want: train once on
    the corpus, route every arriving batch through the same lists,
    compare only within assigned clusters."""
    if model.get("kind") == "distributed":
        from ..functions.numeric import e_int

        cmap, cent = model["cmap_df"], model["cent_df"]
        # probe only lists that HOLD >= 1 fine centroid — the same
        # restriction the batch path's _pass applies (<= c rows)
        lists = {r["m"] for r in cmap.select("m").distinct().collect()}
        probes = _probe_lists_numpy(
            dense, [r for r in model["g_rows"] if r["m"] in lists],
            model["n_probe"],
        )
        # e4 long form of the batch — e_int == the fused kernel's
        # _round_half_away(x·1e4) quantization (pinned by parity tests)
        w_b = dense.select(
            F.col("doc_id"), F.posexplode(F.col("vec")).alias("word", "x")
        ).select(
            "doc_id", "word", e_int(F.col("x").cast("double"), 4).alias("w")
        )
        d2_b = w_b.groupBy("doc_id").agg(
            F.sum(F.col("w") * F.col("w")).alias("x2")
        )
        return _assign_via_probes(w_b, d2_b, cent, probes, cmap)
    return _assign_fused_numpy(
        dense, model["g_rows"], model["cent_rows"], model["cmap_rows"],
        model["n_probe"],
    )


def kmeans_fixedpoint_ivf(
    weights: DataFrame,
    k: int,
    n_list: int | None = None,
    n_probe: int = 2,
    id_col: str = "doc_id",
    word_col: str = "word",
    weight_col: str = "w_e4",
    dense: DataFrame | None = None,
    _want_model: bool = False,
    _max_fused_cells: int | None = None,
) -> DataFrame:
    """Hierarchically-assigned fixed-point K-Means (two assignment
    passes): the scale-safe form of :func:`kmeans_fixedpoint` for k that
    GROWS with the corpus (SemDeDup's k = n/target). Exact Lloyd's
    assignment is n·k distances per pass — with k ∝ n that is the
    measured n²/target cliff (SCALING.md round-5 curve: dedup_semantic
    4.9/18.8/50.3s over 10× data). Here each pass assigns through an IVF
    coarse quantizer instead:

    1. fine seeds: the k md5-min docs (same rule as the exact path);
    2. coarse codebook G: the SAME 2-pass fixed-point Lloyd run over
       just those k seed VECTORS, into ``n_list`` (default
       ceil(sqrt(2k)), the term-balancing choice) coarse lists — k-row
       work, distributed, never driver-side;
    3. per pass: every fine centroid is quantized to its nearest coarse
       list (k·c work), every doc probes its ``n_probe`` nearest lists
       (n·c work) and takes the exact fixed-point argmin over ONLY the
       fine centroids in those lists (n·(n_probe·k/c) work). Per-pass
       cost is n·(c + n_probe·k/c)·d — with c ~ sqrt(k) that is
       n·sqrt(k), i.e. n^1.5/sqrt(target) total instead of n²/target.

    Every stage is the SAME int64 discipline as the exact path (e4
    inputs, x2+c2−2·dot keys, (dist, cluster) tie-break, (2s+n) div (2n)
    updates), so a SQL engine replays it bit-for-bit — the dedup_semantic
    oracle does (plans/extensions2). Approximation note: results can
    differ from exact Lloyd (a doc whose true nearest fine centroid
    lives outside its probed lists lands in the best PROBED cluster) —
    the standard IVF tradeoff; with n_probe >= n_list it degenerates to
    the exact assignment. Centroid tables (k×d rows) are broadcast here;
    at corpus scales where k×d itself outgrows a broadcast, the
    candidate join is still a plain equi-join on (cluster, word) —
    Catalyst falls back to a shuffle join, or store centroids
    partitioned by list id.

    ``dense``: optionally the SAME vectors in dense array form
    (columns ``doc_id``, ``vec`` — raw doubles, pre-quantization). When
    given, the probe stage runs as the Arrow/numpy matmul kernel
    (:func:`_probe_lists_numpy`) instead of the n·d·c word join — the
    measured hot stage (10.6s of 26s at sf1.0) — with the ranking
    pinned bit-identical to the join form. The fine-candidate scoring
    stays a distributed join either way (its tables are k×d — too big
    to ride a closure once k grows with the corpus).

    Returns (doc_id, cluster, dist2) of the SECOND pass, eagerly
    checkpointed (consumers self-join it)."""
    import math

    if n_list is None:
        n_list = max(2, math.ceil(math.sqrt(2 * k)))
    # lazy: the first driver action over w (the fused path's seed-vector
    # collect, or the exact path's seed pick when dense is absent)
    # materializes the checkpoint — the former eager form paid a
    # dedicated job up front (optimization round 12)
    w = weights.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(word_col).alias("word"),
        F.col(weight_col).cast("long").alias("w"),
    ).localCheckpoint(eager=False)
    d2 = w.groupBy("doc_id").agg(F.sum(F.col("w") * F.col("w")).alias("x2"))

    # seed pick: dense ids are unique by contract, so the n·d-row
    # distinct over the exploded form is skipped when dense is given —
    # the md5 ordering (and thus the picked set) is identical
    ids = (
        dense.select("doc_id")
        if dense is not None
        else w.select("doc_id").distinct()
    )
    seed_rows = (
        ids.orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id").limit(k).collect()
    )
    spark = weights.sparkSession
    seed_df = local_df(
        spark, [(r["doc_id"], i) for i, r in enumerate(seed_rows)], "doc_id long, cluster int"
    )
    # Fused fast path (decided from the dense dim BEFORE building the
    # distributed coarse chain): when the k×d fine codebook fits the
    # closure bound it is COLLECTED anyway, so the whole coarse chain
    # (k-row work) runs driver-side in exact int64 numpy
    # (_coarse_model_numpy — bit-identical by the parity tests) and
    # each assignment pass is ONE mapInPandas job. Deletes ~6 tiny
    # Spark jobs per clustering — the measured fixed floor at small SF.
    dim = len(dense.head()["vec"]) if dense is not None else 0
    bound = _FUSED_MAX_CELLS if _max_fused_cells is None else _max_fused_cells
    if dense is not None and k * dim <= bound:
        f0_rows = (
            w.join(F.broadcast(seed_df), "doc_id")
            .select("cluster", "word", F.col("w").alias("cw"))
            .filter(F.col("cw") != 0)
            .collect()
        )
        if f0_rows:
            a2, _model = _fused_chain(w, dense, f0_rows, n_list, n_probe)
            return (a2, _model) if _want_model else a2
    if _want_model and dense is None:
        raise ValueError("a distributed model still needs the dense form")

    # pass-1 fine centroids = the seed vectors (exact zeros dropped —
    # they contribute nothing to c2 or any dot; mirrors the oracle CTE)
    f0 = (
        w.join(F.broadcast(seed_df), "doc_id")
        .select("cluster", "word", F.col("w").alias("cw"))
        .filter(F.col("cw") != 0)
        .localCheckpoint(eager=True)
    )

    # coarse codebook: 2-pass fixed-point Lloyd over the k seed vectors
    # (re-keyed by fine cluster id), into n_list coarse lists
    sw = f0.select(F.col("cluster").alias("doc_id"), "word", F.col("cw").alias("w"))
    sd2 = sw.groupBy("doc_id").agg(F.sum(F.col("w") * F.col("w")).alias("x2"))
    cseed_rows = (
        sw.select("doc_id")
        .distinct()
        .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        .limit(n_list)
        .collect()
    )
    cseed_df = local_df(
        spark, [(r["doc_id"], i) for i, r in enumerate(cseed_rows)], "doc_id long, cluster int"
    )
    g0 = sw.join(F.broadcast(cseed_df), "doc_id").select(
        "cluster", "word", F.col("w").alias("cw")
    )
    ca1 = _assign_fixedpoint(sw, sd2, g0)
    g = _centroid_update(sw, ca1).localCheckpoint(eager=True)

    # fine→coarse map for pass 1: quantize the SEED vectors against G
    cmap1 = (
        _assign_fixedpoint(sw, sd2, g)
        .select(F.col("doc_id").cast("int").alias("cluster"), F.col("cluster").alias("m"))
        .select("cluster", "m")
    )
    g_probe = g.select(F.col("cluster").alias("m"), "word", F.col("cw").alias("gw"))
    g_rows = g_probe.collect() if dense is not None else None  # c×d rows, bounded

    # One hierarchical assignment pass. Remaining kernel tiers (the
    # fused one-pass kernel returned above when the k×d codebook fit
    # the closure bound): (2) numpy probes (c×d codebook — bounded at
    # ANY scale: c ~ sqrt(2k)) + distributed join scoring; (3) all-join
    # form. Probe ranking is always restricted to lists that HOLD at
    # least one fine centroid (a doc probing only fine-empty lists
    # would otherwise get zero candidates and silently vanish from the
    # assignment).
    def _pass(cent: DataFrame, cmap: DataFrame) -> DataFrame:
        if dense is not None:
            lists = {r["m"] for r in cmap.select("m").distinct().collect()}  # <= c rows
            probes = _probe_lists_numpy(
                dense, [r for r in g_rows if r["m"] in lists], n_probe
            )
        else:
            gl = g_probe.join(F.broadcast(cmap.select("m").distinct()), "m")
            probes = _probe_lists(w, d2, gl, n_probe)
        return _assign_via_probes(w, d2, cent, probes, cmap)

    a1 = _pass(f0, cmap1).localCheckpoint(eager=True)

    c1 = _centroid_update(w, a1).localCheckpoint(eager=True)
    # re-quantize the MOVED fine centroids against the same fixed G
    c1w = c1.select(F.col("cluster").cast("long").alias("doc_id"), "word", F.col("cw").alias("w"))
    c1d2 = c1w.groupBy("doc_id").agg(F.sum(F.col("w") * F.col("w")).alias("x2"))
    cmap2 = (
        _assign_fixedpoint(c1w, c1d2, g)
        .select(F.col("doc_id").cast("int").alias("cluster"), F.col("cluster").alias("m"))
        .select("cluster", "m")
    )
    if _want_model:
        cmap2 = cmap2.localCheckpoint(eager=True)  # freeze the map the model holds
    a2 = _pass(c1, cmap2)
    a2 = a2.localCheckpoint(eager=True)
    if _want_model:
        # the large-k model: centroid TABLES, not collected rows — c1 is
        # k×d rows (eagerly checkpointed above), cmap2 is k rows, and
        # g_rows is the c×d coarse codebook (c ~ sqrt(2k), bounded at
        # any scale) that the numpy probe kernel needs in its closure
        return a2, {
            "kind": "distributed",
            "g_rows": g_rows,
            "cent_df": c1,
            "cmap_df": cmap2,
            "n_probe": n_probe,
        }
    return a2


def kmeans_ml(
    spark: SparkSession,
    features: DataFrame,
    k: int,
    max_iter: int,
    seed: int = 42,
    id_col: str = "doc_id",
    word_col: str = "word",
    weight_col: str = "weight",
):
    """Fast non-parity path: Spark MLlib's KMeans over the same sparse
    long-form features (SURVEY.md §7 M4 — 'expose ml.KMeans as the fast
    non-parity path').

    Not reference-parity: k-means|| init, epsilon convergence, no 10dp
    centroid rounding. Use ``kmeans()`` when results must match the
    reference/numpy oracle; use this when you want MLlib's optimized
    distributed implementation (Breeze axpy kernels, init parallelism).

    Returns (assignments DataFrame (doc_id, cluster), fitted model).
    """
    from pyspark.ml.clustering import KMeans as MLKMeans
    from pyspark.ml.linalg import SparseVector, VectorUDT

    # contiguous 0..V-1 indices via the two-phase distributed rank — a
    # global row_number() window would collapse the vocab table to one
    # partition, a real bottleneck at open-vocabulary scale (r3 verdict);
    # the total row count falls out of the same pass (no extra count job)
    from .etl import assign_sequential_ids

    vocab, dim = assign_sequential_ids(
        features.select(word_col).distinct(), [word_col], id_col="_idx", with_total=True
    )
    vocab = vocab.withColumn("_idx", (F.col("_idx") - 1).cast("int"))
    indexed = (
        features.join(F.broadcast(vocab), word_col)
        .groupBy(F.col(id_col).alias("doc_id"))
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_idx"), F.col(weight_col).alias("w")))
            ).alias("entries")
        )
    )

    # Deliberately a Python UDF (the engine's only one, off the parity
    # path): ml.functions.array_to_vector would avoid Python but builds a
    # DENSE dim-wide array per document first — re-creating the reference's
    # dense-vector memory cliff (O23) for wide vocabularies. SparseVector
    # construction keeps the row at nnz cost; this runs once per doc at
    # MLlib ingestion, not in any iterative loop.
    @F.udf(VectorUDT())
    def to_vector(entries):
        return SparseVector(dim, [e["_idx"] for e in entries], [e["w"] for e in entries])

    vecs = indexed.select("doc_id", to_vector("entries").alias("features"))
    model = MLKMeans(k=k, maxIter=max_iter, seed=seed, featuresCol="features").fit(vecs)
    assigned = model.transform(vecs).select(
        "doc_id", F.col("prediction").alias("cluster")
    )
    return assigned, model


def _assign_literal(
    docs_vec: DataFrame, centroids: dict[int, dict[str, float]]
) -> DataFrame:
    """Shuffle-free assignment pass over pre-collected sparse vectors.

    Each centroid becomes a word->weight MAP LITERAL in the plan; the dot
    product folds over the document's own entries (sparse, exactly the
    terms the join path sums), dist2 = max(||x||^2 + ||c||^2 - 2x.c, 0)
    as in ``_assign``, and the argmin is ``array_min`` over
    (dist2, cluster) structs — lexicographic struct ordering reproduces
    the min_by tie-break (lowest cluster on equal distance) exactly."""
    cand = []
    for c in sorted(centroids):
        vec = centroids[c]
        c2 = sum(v * v for v in vec.values())
        cmap = F.create_map(
            *[lit for w in sorted(vec) for lit in (F.lit(w), F.lit(float(vec[w])))]
        )
        dot = F.aggregate(
            F.col("entries"),
            F.lit(0.0),
            lambda acc, e: acc
            + e["weight"] * F.coalesce(F.element_at(cmap, e["word"]), F.lit(0.0)),
        )
        dist2 = F.greatest(F.col("x2") + F.lit(float(c2)) - 2 * dot, F.lit(0.0))
        cand.append(F.struct(dist2.alias("dist2"), F.lit(c).cast("int").alias("cluster")))
    best = F.array_min(F.array(*cand))
    return docs_vec.select(
        "doc_id",
        "entries",
        F.col("x2"),
        best["cluster"].alias("cluster"),
        best["dist2"].alias("dist2"),
    )


def _collect_centroids(centroids_df: DataFrame) -> dict[int, dict[str, float]]:
    out: dict[int, dict[str, float]] = {}
    for row in centroids_df.collect():
        out.setdefault(row["cluster"], {})[row["word"]] = row["cweight"]
    return out


def _converged(old: dict[int, dict[str, float]], new: dict[int, dict[str, float]]) -> bool:
    return all(new.get(c) == old[c] for c in old)


def _assign(
    spark: SparkSession,
    feats: DataFrame,
    doc_norms: DataFrame,
    centroids: dict[int, dict[str, float]],
) -> DataFrame:
    """One assignment pass: (doc_id, cluster, dist2) for every document.

    dist2(x, c) = ||x||^2 + ||c||^2 - 2 x.c over sparse rows: the dot
    product only needs words the document actually has (join on word with
    the broadcast centroid table); documents sharing no word with a
    centroid still get a row via the doc_norms x centroid_norms cross
    (k rows broadcast — BroadcastNestedLoopJoin, no shuffle of the docs).
    """
    c_rows = [
        (c, w, wt) for c, vec in centroids.items() for w, wt in vec.items()
    ]
    c_df = local_df(spark, c_rows, "cluster int, word string, cweight double")
    c_norms = local_df(
        spark,
        [(c, sum(v * v for v in vec.values())) for c, vec in centroids.items()],
        "cluster int, c2 double",
    )
    dots = (
        feats.join(F.broadcast(c_df), "word")
        .groupBy("doc_id", "cluster")
        .agg(F.sum(F.col("weight") * F.col("cweight")).alias("dot"))
    )
    all_pairs = doc_norms.crossJoin(F.broadcast(c_norms))
    dist = (
        all_pairs.join(dots, ["doc_id", "cluster"], "left")
        .withColumn("dot", F.coalesce(F.col("dot"), F.lit(0.0)))
        .withColumn(
            "dist2",
            F.greatest(F.col("x2") + F.col("c2") - 2 * F.col("dot"), F.lit(0.0)),
        )
    )
    # O32 argmin with the defined tie-break: lowest cluster index wins.
    best = dist.groupBy("doc_id").agg(
        F.min_by(
            F.struct("cluster", "dist2"), F.struct("dist2", "cluster")
        ).alias("best")
    )
    return best.select("doc_id", F.col("best.cluster").alias("cluster"), F.col("best.dist2").alias("dist2"))
