"""Vector math over array<float>/array<double> embedding columns.

Two execution paths, same floating-point results on well-formed data:

- ``dot_product``/``l2_norm``/``cosine_similarity``: pure column
  expressions (``zip_with`` + ``aggregate``). Accumulation is sequential
  left-to-right in double precision, which makes results bit-reproducible
  (and matchable by an oracle that accumulates the same way). Spark's
  higher-order functions are ``CodegenFallback`` — evaluated interpreted
  per ELEMENT (~100 ns each measured) and they disable whole-stage
  codegen for the surrounding operator — but inside join+filter
  pipelines they evaluate INLINE and prune rows immediately, which is
  why the per-pair cosine call sites keep this path (measured x1.1-2.6
  faster than the Arrow path there, scripts/ab_vec_r11.py).
- ``plane_dots_arrow`` (+ ``dot_product_arrow``/``l2_norm_arrow``):
  Arrow-batched pandas UDFs whose numpy accumulation is SEQUENTIAL OVER
  THE DIMENSION and vectorized over rows
  (``for i: acc += a[:, i] * b[:, i]``) — the exact same left-to-right
  double-precision fold per row, so values are bit-identical to the
  expression path (scripts/probe_vec_codegen.py asserts max |delta| == 0
  before timing). This wins where MANY dots share one traversal per row
  with no pruning opportunity — the 16-plane LSH band hash: x5.8 on the
  isolated stage, x2-2.7 on the ann_lsh/embedding_neardup_lsh/
  embedding_neardup_capped registry rows (interleaved A/B).

Edge-case differences of the Arrow path (documented contract):

- Ragged batches (vectors of differing lengths) RAISE a ValueError
  instead of null-padding like ``zip_with``; ``plane_dots_arrow``
  instead yields a null dots array for a wrong-length row (its callers'
  sign guards raise on it).
- A null COMPONENT inside a vector surfaces as NaN (Arrow->pandas
  conversion), where ``zip_with`` yields a null dot. A null VECTOR
  yields a null dot on both paths.

At scale: narrow per-row ops (no shuffle); the Arrow path adds one
ArrowEvalPython node per stage and batches 10k rows per crossing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Sum_i a[i]*b[i] in double precision (sequential accumulation)."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a, b); null-safe on zero vectors (returns null, not NaN)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0.0, dot_product(a, b) / denom)


# --------------------------------------------------------------------------
# Arrow-vectorized path (round 11). One numpy matrix per batch; the dim
# loop keeps the per-row accumulation order identical to the expression
# path. Nulls: pandas hands a null list element as None in the object
# array -> _stack masks those rows out and the UDF returns null for them
# (both paths agree: null vector -> null dot).


def _stack(s: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """(matrix, valid_mask); raises on ragged non-null rows."""
    vals = s.to_numpy()
    mask = np.array([v is not None for v in vals])
    if not mask.all():
        vals = vals[mask]
    if len(vals) == 0:
        return np.zeros((0, 0)), mask
    try:
        m = np.stack(vals).astype(np.float64, copy=False)
    except ValueError as e:  # ragged rows
        lens = {len(v) for v in vals}
        raise ValueError(
            f"vector length mismatch within batch: lengths {sorted(lens)}; "
            "Arrow-vectorized dot products need fixed-dimension vectors"
        ) from e
    return m, mask


def _seq_pair_dot(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    if A.shape[1] != B.shape[1]:
        raise ValueError(
            f"vector length mismatch: {A.shape[1]} vs {B.shape[1]}"
        )
    acc = np.zeros(A.shape[0])
    for i in range(A.shape[1]):
        acc += A[:, i] * B[:, i]
    return acc


def _unmask(vals: np.ndarray, mask: np.ndarray) -> pd.Series:
    if mask.all():
        return pd.Series(vals)
    # object dtype so null rows come back as SQL nulls, not NaN (a float64
    # Series cannot hold None, and NaN compares as LARGEST in Spark)
    out = np.empty(mask.shape[0], dtype=object)
    out[mask] = vals
    out[~mask] = None
    return pd.Series(out)


def _pair_dot_fn(a: pd.Series, b: pd.Series) -> pd.Series:
    av, bv = a.to_numpy(), b.to_numpy()
    mask = np.array(
        [x is not None and y is not None for x, y in zip(av, bv)],
        dtype=bool,
    )
    if not mask.all():
        av, bv = av[mask], bv[mask]
    A, _ = _stack(pd.Series(av))
    B, _ = _stack(pd.Series(bv))
    return _unmask(_seq_pair_dot(A, B), mask)


def _self_dot_fn(a: pd.Series) -> pd.Series:
    A, mask = _stack(a)
    return _unmask(_seq_pair_dot(A, A), mask)


# The pandas_udf WRAPPERS are created lazily at plan-build time (driver
# side), NOT as module-level decorators: a module-level @pandas_udf
# executes on IMPORT, and executor Python workers import this module
# (via any UDF whose closure references the package) with no active
# SparkSession — PySparkRuntimeError SESSION_OR_CONTEXT_NOT_EXISTS
# (observed live when a mid-flight bench picked the decorator up in its
# workers). Not cached either: a UserDefinedFunction memoizes its judf
# against the session that first used it, which goes stale across
# session restarts; creation is a trivial plan-build-time cost.


def _pair_dot_udf():
    return F.pandas_udf(_pair_dot_fn, "double")


def _self_dot_udf():
    return F.pandas_udf(_self_dot_fn, "double")


def dot_product_arrow(a: Column | str, b: Column | str) -> Column:
    """Arrow-vectorized ``dot_product`` (bit-identical fold; see module
    docstring for the ragged/null-component edge contract)."""
    return _pair_dot_udf()(_c(a), _c(b))


def l2_norm_arrow(a: Column | str) -> Column:
    """Arrow-vectorized ``l2_norm`` (sqrt applied JVM-side)."""
    return F.sqrt(_self_dot_udf()(_c(a)))


def cosine_similarity_arrow(a: Column | str, b: Column | str) -> Column:
    denom = l2_norm_arrow(a) * l2_norm_arrow(b)
    return F.when(denom != 0.0, dot_product_arrow(a, b) / denom)


def plane_dots_arrow(
    vec: Column | str,
    planes: list[list[float]],
    with_self_dot: bool = False,
    single_eval: bool = False,
) -> Column:
    """array<double> of ``<vec, plane_p>`` for every plane, in one
    Arrow-batched pass (the LSH band-hash inner loop: all plane dots share
    one traversal of the vector, vectorized over the batch).

    Null vector -> null array. A vector whose length differs from the
    plane dim yields an all-null array (callers' sign guards raise on it,
    matching the zip_with null-pad behavior this replaces).

    ``with_self_dot``: append ``<vec, vec>`` as one extra trailing element
    (index ``len(planes)``), so a caller that also needs the vector's norm
    gets it from the SAME single Python pass — ``sqrt(dots[k])`` is then
    bit-identical to ``l2_norm`` (same sequential per-dimension fold), and
    no separate interpreted-HOF norm column survives to be inlined N times
    by projection collapse / filter pushdown (the round-11 assignment-
    projection lesson).  Unlike the plane dots, the self-dot is
    dimension-independent: it is computed for EVERY non-null vector, even
    ones whose length differs from the plane dim (mixed lengths are folded
    per length group; per-row accumulation is row-independent, so grouping
    does not change any row's fold order).

    NULL-COMPONENT parity (round 12, ADVICE r11): in ``with_self_dot``
    mode a non-null vector containing a NULL element is pre-nulled
    JVM-SIDE (one ``exists`` traversal) before it crosses into Python —
    Arrow->pandas folds null elements into NaN, which is
    indistinguishable from a data NaN inside the UDF, but the expression
    path (``zip_with``/``aggregate``) yields a NULL dot and NULL norm for
    such a vector while propagating a data NaN as NaN.  Pre-nulling makes
    the whole dots row (and the self-dot) NULL, so the projection
    assignment paths drop/keep exactly the rows the join paths do.  The
    plain band-hash mode (``with_self_dot=False``) keeps its documented
    NaN contract unchanged (registered-query behavior).

    ``single_eval``: mark the UDF non-deterministic (guide §4.4) so the
    optimizer may not duplicate it — a filter or a second projection over a
    column derived from the dots otherwise re-inlines the UDF call and the
    plan grows a SECOND ArrowEvalPython node (every row pays the matrix
    pass twice; observed on the assignment-projection path).  The function
    IS deterministic; the flag only constrains the optimizer.  Leave it off
    for single-consumer expressions like the LSH band hash.
    """
    P = np.array(planes, dtype=np.float64)  # n_planes x dim

    @F.pandas_udf("array<double>")
    def _dots(s: pd.Series) -> pd.Series:
        vals = s.to_numpy()
        out: list = []
        ok_rows = [
            v for v in vals if v is not None and len(v) == P.shape[1]
        ]
        if ok_rows:
            V = np.stack(ok_rows).astype(np.float64, copy=False)
            acc = np.zeros((V.shape[0], P.shape[0]))
            for i in range(P.shape[1]):
                acc += V[:, i : i + 1] * P[:, i]
        selfd: dict[int, float] = {}
        if with_self_dot:
            by_len: dict[int, list[int]] = {}
            for idx, v in enumerate(vals):
                if v is not None:
                    by_len.setdefault(len(v), []).append(idx)
            for n, idxs in by_len.items():
                V = np.stack([vals[i] for i in idxs]).astype(
                    np.float64, copy=False
                )
                sd = np.zeros(V.shape[0])
                for i in range(n):
                    sd += V[:, i] * V[:, i]
                for pos, idx in enumerate(idxs):
                    selfd[idx] = sd[pos]
        j = 0
        for idx, v in enumerate(vals):
            if v is None:
                out.append(None)
            elif not with_self_dot:
                # unchanged hot path (LSH band hash): numpy row or None
                if len(v) != P.shape[1]:
                    out.append(None)
                else:
                    out.append(acc[j])
                    j += 1
            else:
                if len(v) != P.shape[1]:
                    row: list = [None] * P.shape[0]
                else:
                    row = list(acc[j])
                    j += 1
                row.append(selfd[idx])
                out.append(row)
        return pd.Series(out)

    if single_eval:
        _dots = _dots.asNondeterministic()
    v = _c(vec)
    if with_self_dot:
        # null-component parity with the expression path (see docstring):
        # null and NaN elements are only distinguishable JVM-side
        v = F.when(~F.exists(v, lambda x: x.isNull()), v)
    return _dots(v)
