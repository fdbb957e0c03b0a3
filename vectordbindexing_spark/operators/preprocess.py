"""Whitening / centering preprocessing — the reference's "Norm" method
(`hnsw_cosine_norm.py:117-335`): fit mean+covariance on a sample, SVD,
PCA or ZCA whitening transform, optional per-modality scaling.

Spark formulation (SURVEY §2.10): distributed moment aggregation
(mapInPandas partial sums — one data pass, (d + d²) floats per partition to
the driver), driver-side SVD (d ≤ ~1024), broadcast (μ, W) matmul
transform. Matches the reference's eigenvalue floor and α-blend options.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectordbindexing_spark.functions.vector import to_double_array

EPS_EIG = 1e-12  # eigenvalue floor, hnsw_cosine_norm.py:226


@dataclass
class WhiteningModel:
    mean: np.ndarray          # (d,)
    W: np.ndarray             # (d_out, d) whitening matrix
    mode: str                 # 'pca' | 'zca'
    modality_scale: dict[str, float] | None = None

    def transform_np(self, X: np.ndarray, modality: str | None = None) -> np.ndarray:
        out = (X - self.mean) @ self.W.T
        if self.modality_scale and modality in self.modality_scale:
            out = out * self.modality_scale[modality]
        return out


def _moments(df: DataFrame, vec_col: str) -> tuple[np.ndarray, np.ndarray, int]:
    """One-pass distributed (Σx, ΣxxT, n)."""

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        s = None
        ss = None
        n = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            if s is None:
                d = X.shape[1]
                s = np.zeros(d)
                ss = np.zeros((d, d))
            s += X.sum(axis=0)
            ss += X.T @ X
            n += len(X)
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "ss": [ss.ravel().tolist()]}
            )

    parts = (
        df.select(F.col(vec_col).alias("v"))
        .mapInPandas(partials, schema="n long, s array<double>, ss array<double>")
        .collect()
    )
    n = sum(r["n"] for r in parts)
    s = np.sum([np.asarray(r["s"]) for r in parts], axis=0)
    d = len(s)
    ss = np.sum([np.asarray(r["ss"]).reshape(d, d) for r in parts], axis=0)
    return s, ss, n


def dim_variances(
    df: DataFrame, vec_col: str = "vec", group_col: str | None = None
) -> DataFrame:
    """Per-dimension population variance, optionally per group (modality):
    the σ²_t,k / σ²_v,k vectors of the Idea-1023 weighted-L2 distance
    (Idea-1023.md:78-82, which cites streaming variance — Spark's partial
    aggregation gives exactly that).

    Declarative formulation (posexplode → groupBy(dim)) so a SQL oracle can
    reproduce it; for wide tables use the one-pass ``_moments`` kernel and
    take diag(cov) instead.
    """
    ex = df.select(
        *( [F.col(group_col)] if group_col else [] ),
        F.posexplode(to_double_array(vec_col)).alias("dim", "x"),
    )
    keys = ([group_col] if group_col else []) + ["dim"]
    return ex.groupBy(*keys).agg(
        (F.avg(F.col("x") * F.col("x")) - F.avg("x") * F.avg("x")).alias("variance")
    )


def blended_inv_weights(
    df: DataFrame,
    vec_col: str,
    modality_col: str,
    mod_a: str,
    mod_b: str,
    alpha: float = 0.5,
    eps: float = 1e-6,
) -> list[float]:
    """w_k = 1/(α·σ²_a,k + (1-α)·σ²_b,k + ε) as a plain list (broadcast into
    the weighted-L2 expression)."""
    rows = (
        dim_variances(df.filter(F.col(modality_col).isin(mod_a, mod_b)),
                      vec_col, modality_col)
        .collect()
    )
    by = {}
    for r in rows:
        by.setdefault(r[modality_col], {})[r["dim"]] = r["variance"]
    dims = sorted(by[mod_a])
    return [
        1.0 / (alpha * by[mod_a][d] + (1 - alpha) * by[mod_b][d] + eps)
        for d in dims
    ]


def whitening_fit(
    df: DataFrame,
    vec_col: str = "vec",
    mode: str = "pca",
    n_components: int | None = None,
    sample_fraction: float | None = None,
    seed: int = 42,
    modality_col: str | None = None,
) -> WhiteningModel:
    """Fit mean + covariance → SVD → whitening matrix
    (hnsw_cosine_norm.py:164-239). ``sample_fraction`` mirrors the
    reference's sample_size bound; per-modality scaling equalizes mean
    norms (:241-260)."""
    data = df if sample_fraction is None else df.sample(sample_fraction, seed=seed)
    s, ss, n = _moments(data, vec_col)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    # SVD of the symmetric covariance (== eigendecomposition)
    U, sv, _ = np.linalg.svd(cov, hermitian=True)
    sv = np.maximum(sv, EPS_EIG)
    if n_components is not None:
        U, sv = U[:, :n_components], sv[:n_components]
    if mode == "pca":
        W = (U / np.sqrt(sv)).T                 # (d_out, d)
    elif mode == "zca":
        W = U @ np.diag(1.0 / np.sqrt(sv)) @ U.T
    else:
        raise ValueError(f"unknown whitening mode {mode!r}")
    model = WhiteningModel(mean=mean, W=W, mode=mode)
    if modality_col is not None:
        # mean whitened norm per modality → scale each to the global mean
        norms = whitening_transform(df, model, vec_col).select(
            F.col(modality_col).alias("m"),
            F.sqrt(
                F.aggregate("wvec", F.lit(0.0), lambda a, x: a + x * x)
            ).alias("nrm"),
        )
        rows = norms.groupBy("m").agg(F.avg("nrm").alias("avg_nrm")).collect()
        overall = np.mean([r["avg_nrm"] for r in rows])
        model.modality_scale = {
            r["m"]: float(overall / r["avg_nrm"]) for r in rows if r["avg_nrm"] > 0
        }
    return model


def whitening_transform(
    df: DataFrame,
    model: WhiteningModel,
    vec_col: str = "vec",
    modality_col: str | None = None,
    out_col: str = "wvec",
) -> DataFrame:
    """Broadcast (μ, W) matmul over Arrow batches
    (hnsw_cosine_norm.py:262-335). Appends ``out_col`` array<double>."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(model)
    cols = df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m: WhiteningModel = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            out = (X - m.mean) @ m.W.T
            if m.modality_scale and modality_col is not None:
                scale = np.array(
                    [m.modality_scale.get(x, 1.0) for x in pdf[modality_col]]
                )
                out = out * scale[:, None]
            pdf = pdf.copy()
            pdf[out_col] = [row.tolist() for row in out]
            yield pdf

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
    schema += f", {out_col} array<double>"
    return df.mapInPandas(run, schema=schema)
