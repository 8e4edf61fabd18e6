"""Isotonic regression by pool-adjacent-violators (PAVA) over BOUNDED
bucket sufficient statistics.

PAVA itself is a sequential stack algorithm, so it cannot run as a
distributed fold — but it never needs to: the monotone fit only
depends on the per-bucket (count, sum) pairs, and the bucket domain is
bounded by construction (a fixed quantization of the score axis). So
the 100 TB pass is ONE map-side-combinable groupBy to ≤B cells; the
driver solves PAVA on B rows with EXACT integer rationals (pool means
compared by cross-multiplication — no float drift, same discipline as
the repo's k-means/BPE driver cutovers); the fitted step function goes
back as a broadcast-sized literal table.

Reference intent: the reference trains global models by collecting
bounded per-partition statistics to the driver (e.g.
code/src/global_model_manager.py's exemplar stats); this applies the
same bounded-cutover rule to the classic calibration fit.
"""

from __future__ import annotations


def pava_rational(cells: list[tuple[int, int, int]]) -> list[tuple[int, int, int]]:
    """cells = [(bucket, n, sum_y)] sorted by bucket; returns one row
    per input bucket as (bucket, pool_num, pool_den) where
    pool_num/pool_den is the nondecreasing least-squares fit (the pool
    mean), kept as an exact rational."""
    pools: list[list[int]] = []  # [num, den, n_buckets]
    for _bucket, n, sy in cells:
        pools.append([sy, n, 1])
        # merge while the previous pool mean exceeds the current:
        # num1/den1 > num2/den2  ⇔  num1·den2 > num2·den1 (dens > 0)
        while len(pools) > 1 and pools[-2][0] * pools[-1][1] > pools[-1][0] * pools[-2][1]:
            num2, den2, k2 = pools.pop()
            pools[-1][0] += num2
            pools[-1][1] += den2
            pools[-1][2] += k2
    out: list[tuple[int, int, int]] = []
    i = 0
    for num, den, k in pools:
        for _ in range(k):
            out.append((cells[i][0], num, den))
            i += 1
    return out
