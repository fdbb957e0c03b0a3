"""KNN physical-strategy selection (SURVEY §4 "custom work" item 1).

The reference hand-picks between brute force, LSH candidate pools and graph
search per experiment; here a planner function chooses from table sizes —
the Python-level analog of a Catalyst strategy (kept to the public API on
purpose; a spark.sql.extensions rewrite rule is a stretch goal).

Strategies:
  exact-blocked   queries broadcastable → one base scan, numpy matmul
  exact-expr      both sides big but candidates already pruned upstream
  lsh             large base, approximate OK → bucket equi-join
  ivf             large base, repeated query batches → amortized k-means
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

# Above this many base rows, exact scanning costs more than LSH/IVF build.
EXACT_BASE_LIMIT = 2_000_000
# Queries beyond this don't broadcast (matches exact_knn._BLOCKED_THRESHOLD).
BROADCAST_QUERY_LIMIT = 100_000


@dataclass
class KnnPlan:
    strategy: str
    params: dict

    def __repr__(self) -> str:  # shown in logs/explain-style output
        return f"KnnPlan({self.strategy}, {self.params})"


def plan_knn(
    n_queries: int,
    n_base: int,
    k: int,
    approximate_ok: bool = False,
    repeated_queries: bool = False,
) -> KnnPlan:
    """Pure sizing decision — callers pass known/estimated counts so the
    planner itself triggers no Spark jobs."""
    if n_base <= EXACT_BASE_LIMIT or not approximate_ok:
        if n_queries <= BROADCAST_QUERY_LIMIT:
            return KnnPlan("exact-blocked", {"impl": "blocked"})
        return KnnPlan("exact-expr", {"impl": "expr"})
    if repeated_queries:
        nlist = max(16, int(n_base ** 0.5))
        return KnnPlan("ivf", {"nlist": nlist, "nprobe": max(1, nlist // 8)})
    return KnnPlan("lsh", {"num_bits": 12, "num_tables": 8})


def knn(
    queries: DataFrame,
    base: DataFrame,
    k: int = 10,
    metric: str = "cosine",
    approximate_ok: bool = False,
    repeated_queries: bool = False,
    **cols,
) -> DataFrame:
    """Planner-dispatched KNN — probes the sides and routes to the chosen
    operator. All strategies share the output schema
    (qid, nbr_rank, neighbor_id, dist).

    Sizing uses bounded probes: ``limit(N+1).count()`` stops scanning at
    N+1 rows, so routing costs O(threshold) even on a 100 TB corpus. The
    thresholds are the only comparisons plan_knn makes, so capped counts
    decide identically to exact ones; only the IVF path re-counts exactly
    (nlist=√n), amortized over its full-scan build."""
    n_q = queries.limit(BROADCAST_QUERY_LIMIT + 1).count()
    n_b = base.limit(EXACT_BASE_LIMIT + 1).count()
    plan = plan_knn(n_q, n_b, k, approximate_ok, repeated_queries)
    if plan.strategy == "ivf":
        plan = plan_knn(n_q, base.count(), k, approximate_ok, repeated_queries)
    if plan.strategy in ("exact-blocked", "exact-expr"):
        from vectordbindexing_spark.operators.exact_knn import exact_knn

        return exact_knn(queries, base, k, metric, impl=plan.params["impl"], **cols)
    if plan.strategy == "ivf":
        from vectordbindexing_spark.operators.ivf import ivf_knn

        return ivf_knn(queries, base, k, metric=metric, **plan.params, **cols)
    from vectordbindexing_spark.operators.lsh import lsh_knn

    return lsh_knn(queries, base, k, metric=metric, **plan.params, **cols)
