"""Seeded synthetic multimodal vector generator — semantics of the
reference's `hnsw_optimization/data_loader.py:30-96` (per-modality Gaussian
cluster center ×2.0 + noise ×0.5, L2-normalized, queries from the same
centers with seed+1) and `roargraph_python.py:437-448`.

Two implementations of the same formula (Box–Muller over md5-derived
uniforms, so any worker produces identical rows without shared RNG
state):

- ``impl="arrow"`` (default): a mapInPandas kernel — hashlib md5 +
  numpy, per-modality centers computed once per batch. ~500 md5/row is
  microseconds in Python but MILLISECONDS in interpreted Catalyst
  expressions (the expr path measured ~7 ms/row at d=128 — the
  128-element transform() lambda falls out of whole-stage codegen), so
  this is the path that actually generates millions of rows.
- ``impl="expr"``: the fully declarative Column formulation — useful as
  the engine-level reference of the formula and for tiny fixtures.

Both are deterministic and distributed; they agree to libm ulp (JVM vs
numpy log/cos), not bit-exactly — pick one per dataset. Nothing
oracle-pinned consumes synthetic data.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordbindexing_spark.functions.vector import unit_norm

TWO_PI = 6.283185307179586


def _u01(tag: Column) -> Column:
    """Deterministic uniform(0,1) from a string tag (md5 high 8 hex)."""
    h = F.conv(F.substring(F.md5(tag), 1, 8), 16, 10).cast("double")
    return (h + 0.5) / F.lit(4294967296.0)


def _gauss(tag: Column) -> Column:
    """Box–Muller from two derived uniforms."""
    u1 = _u01(F.concat(tag, F.lit(":a")))
    u2 = _u01(F.concat(tag, F.lit(":b")))
    return F.sqrt(-2.0 * F.log(u1)) * F.cos(F.lit(TWO_PI) * u2)


def _u01_py(tag: str) -> float:
    import hashlib

    h = int(hashlib.md5(tag.encode()).hexdigest()[:8], 16)
    return (h + 0.5) / 4294967296.0


def _gauss_py(tag: str) -> float:
    u1 = _u01_py(tag + ":a")
    u2 = _u01_py(tag + ":b")
    return math.sqrt(-2.0 * math.log(u1)) * math.cos(TWO_PI * u2)


def synthetic_vectors(
    spark: SparkSession,
    n: int,
    dim: int,
    n_modalities: int = 2,
    seed: int = 42,
    noise_seed: int | None = None,
    center_scale: float = 2.0,
    noise_scale: float = 0.5,
    id_col: str = "id",
    vec_col: str = "vec",
    impl: str = "arrow",
) -> DataFrame:
    """(id, vec, modality) — unit-normalized Gaussian clusters.

    vec = normalize(center(modality)·center_scale + noise(id)·noise_scale),
    mirroring data_loader.py:68-96; modality = id % n_modalities. ``seed``
    fixes the cluster centers; ``noise_seed`` (default seed) varies the
    per-row noise so a query set can share centers (data_loader.py:62-64).
    """
    noise_seed = seed if noise_seed is None else noise_seed
    if impl == "arrow":
        return _synthetic_vectors_arrow(
            spark, n, dim, n_modalities, seed, noise_seed,
            center_scale, noise_scale, id_col, vec_col,
        )
    df = spark.range(n).withColumnRenamed("id", "_i")
    mod = (F.col("_i") % n_modalities).cast("int")
    dims = F.sequence(F.lit(0), F.lit(dim - 1))
    center_tag = F.concat(
        F.lit(f"c:{seed}:"), mod.cast("string"), F.lit(":"), F.lit("d:")
    )
    noise_tag = F.concat(
        F.lit(f"n:{noise_seed}:"), F.col("_i").cast("string"), F.lit(":d:")
    )
    vec = F.transform(
        dims,
        lambda d: (
            _gauss(F.concat(center_tag, d.cast("string"))) * center_scale
            + _gauss(F.concat(noise_tag, d.cast("string"))) * noise_scale
        ).cast("float"),
    )
    return df.select(
        F.col("_i").alias(id_col),
        unit_norm(vec).alias(vec_col),
        F.concat(F.lit("mod"), mod.cast("string")).alias("modality"),
    )


def _synthetic_vectors_arrow(
    spark, n, dim, n_modalities, seed, noise_seed,
    center_scale, noise_scale, id_col, vec_col,
) -> DataFrame:
    """Same formula as the expr path, computed in a mapInPandas kernel:
    raw elements round through float32 (the expr path's .cast('float'))
    then L2-normalize in float64 — the unit_norm contract."""
    from collections.abc import Iterator

    import pandas as pd

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        centers = {
            m: np.array(
                [_gauss_py(f"c:{seed}:{m}:d:{d}") for d in range(dim)]
            )
            for m in range(n_modalities)
        }
        for pdf in batches:
            ids = pdf["_i"].to_numpy()
            vecs, mods = [], []
            for i in ids:
                i = int(i)
                m = i % n_modalities
                noise = np.array(
                    [
                        _gauss_py(f"n:{noise_seed}:{i}:d:{d}")
                        for d in range(dim)
                    ]
                )
                raw = (
                    (centers[m] * center_scale + noise * noise_scale)
                    .astype(np.float32)
                    .astype(np.float64)
                )
                nrm = math.sqrt(float(raw @ raw))
                vecs.append(raw / nrm if nrm > 1e-12 else raw)
                mods.append(f"mod{m}")
            yield pd.DataFrame(
                {"_i": ids, "_v": vecs, "_m": mods}
            )

    return (
        spark.range(n)
        .withColumnRenamed("id", "_i")
        .repartition(max(2, spark.sparkContext.defaultParallelism))
        .mapInPandas(gen, schema="_i long, _v array<double>, _m string")
        .select(
            F.col("_i").alias(id_col),
            F.col("_v").alias(vec_col),
            F.col("_m").alias("modality"),
        )
    )


def synthetic_queries(
    spark: SparkSession,
    n: int,
    dim: int,
    n_modalities: int = 2,
    seed: int = 42,
    **kw,
) -> DataFrame:
    """Query set from the same modality centers, noise seed+1
    (data_loader.py:62-64)."""
    return synthetic_vectors(
        spark, n, dim, n_modalities, seed=seed, noise_seed=seed + 1, **kw
    ).withColumnRenamed("id", "qid")
