#!/usr/bin/env python
"""Guarded-path RECALL probe for semdedup's oversized-cluster guard.

The round-5 skew probe showed the guard marks near-identical boilerplate
identically to the exact path; the documented miss case — a genuine dup
pair at NEAR-THRESHOLD cosine colliding in no band — was untested. This
probe measures it directly: a corpus of engineered borderline pairs at
controlled cosine just above each threshold, all forced into ONE
oversized cluster so every pair must survive the banded sign-LSH
sub-bucket path, swept over threshold x bands.

Corpus: ``N_PAIRS`` (base, partner) pairs with cos(base, partner) set
EXACTLY to threshold + delta (partner = c*u + sqrt(1-c^2)*w, w unit and
orthogonal to u), plus the same number of negatives at threshold - 0.03.
Bases are random unit vectors, so cross-pair cosines are ~0 and the only
dups are the engineered partners: |exact dup set| = N_PAIRS, and

    recall = |guarded dups ∩ exact dups| / |exact dups|

isolates exactly the band-collision miss rate. Expected (sign-LSH,
agreement prob p = 1 - arccos(c)/pi, P[miss] = (1 - p^(planes/bands))^bands):
more bands of fewer bits collide more — bands is the recall-escalation
knob, at the cost of more sub-bucket rows.

Usage: python scripts/probe_semdedup_recall.py [n_pairs]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from ia_hadoop_tools_spark.operators.similarity import semdedup  # noqa: E402
from ia_hadoop_tools_spark.session import get_spark  # noqa: E402

N_PAIRS = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
DIM = 64
CAP = 100
DELTA = 0.005  # positives sit at threshold + DELTA: genuinely borderline
THRESHOLDS = (0.90, 0.95, 0.99)
BANDS = (4, 8)


def build(spark, threshold: float):
    rng = np.random.default_rng(6)
    rows = []
    for i in range(N_PAIRS):
        u = rng.standard_normal(DIM)
        u /= np.linalg.norm(u)
        w = rng.standard_normal(DIM)
        w -= w @ u * u
        w /= np.linalg.norm(w)
        c = min(threshold + DELTA, 0.9999)
        v = c * u + math.sqrt(1 - c * c) * w
        # negatives use an INDEPENDENT orthogonal direction: sharing w
        # would put neg within threshold of v (cos = cos(angle delta))
        w2 = rng.standard_normal(DIM)
        w2 -= w2 @ u * u
        w2 -= (w2 @ w) / (w @ w) * w
        w2 /= np.linalg.norm(w2)
        c2 = threshold - 0.03
        neg = c2 * u + math.sqrt(1 - c2 * c2) * w2
        rows.append((3 * i, [float(x) for x in u]))
        rows.append((3 * i + 1, [float(x) for x in v]))  # dup of 3i
        rows.append((3 * i + 2, [float(x) for x in neg]))  # non-dup
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).persist()
    df.count()
    cent = spark.createDataFrame(
        [(0, [1.0] * DIM)], "centroid_id long, centroid array<double>"
    )
    return df, cent


def dup_set(df, cent, threshold, cap, bands, num_planes=16, auto=True):
    out = semdedup(
        df, cent, threshold=threshold, max_cluster_size=cap,
        bands=bands, num_planes=num_planes, dim=DIM, auto_planes=auto,
    )
    dups = {r.vec_id for r in out.filter("is_dup").collect()}
    out.assign_cache.unpersist()
    return dups


def main():
    spark = get_spark("probe-semdedup-recall")
    print(f"n_pairs={N_PAIRS} dim={DIM} cap={CAP} delta=+{DELTA}")
    # bits/band auto_planes would pick for this cluster size (expected
    # bucket ~ cap/2) — passed explicitly for the auto=False geometry
    # rows so they isolate the BAND-count effect the escalation targets
    bits = math.ceil(math.log2(2 * 3 * N_PAIRS / CAP))
    for th in THRESHOLDS:
        df, cent = build(spark, th)
        exact = dup_set(df, cent, th, None, 4)
        line = [f"th={th:.2f} exact_dups={len(exact)}"]
        p = 1 - math.acos(min(th + DELTA, 0.9999)) / math.pi
        for b in BANDS:
            guarded = dup_set(
                df, cent, th, CAP, b, num_planes=bits * b, auto=False
            )
            recall = len(guarded & exact) / max(1, len(exact))
            extra = len(guarded - exact)
            pred = 1 - (1 - p**bits) ** b
            line.append(
                f"bands={b}: recall={recall:.4f} (pred~{pred:.4f},"
                f" false_dups={extra})"
            )
        # the shipped DEFAULT: bands=4 request, auto escalation ON
        # (round-7: bands raise to AUTO_GUARD_BANDS when the guard
        # engages) — the no-manual-tuning row the contract pins
        guarded = dup_set(df, cent, th, CAP, 4)
        recall = len(guarded & exact) / max(1, len(exact))
        extra = len(guarded - exact)
        line.append(
            f"auto-default: recall={recall:.4f} (false_dups={extra})"
        )
        print(" | ".join(line))
        df.unpersist()


if __name__ == "__main__":
    main()
