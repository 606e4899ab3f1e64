"""zipf_fit: exact python replay (micro-nat least squares with floor
division), a perfect power-law corpus recovering its slope, top_k
truncation, degenerate vocab, guard."""

import math

import pytest

from horus_spark.operators.textstats import zipf_fit


def _py_fit(counts, top_k):
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
    xs, ys = [], []
    for r, (_, c) in enumerate(top, start=1):
        xs.append(round(math.log(r) * 1e6))
        ys.append(round(math.log(c) * 1e6))
    n = len(xs)
    if n < 2:
        return n, None
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    num, den = n * sxy - sx * sy, n * sxx - sx * sx
    if den == 0:
        return n, None
    mag = (abs(num) * 1_000_000) // den
    return n, -mag if num < 0 else mag


def _corpus(spark, counts):
    text = " ".join(
        " ".join([w] * c) for w, c in sorted(counts.items())
    )
    return spark.createDataFrame([(text,)], "text string")


def test_exact_replay_and_power_law(spark):
    # freq(rank) = round(1000 * rank^-1) -> slope must come out ~ -1
    counts = {f"w{r:02d}": max(round(1000 / r), 1) for r in range(1, 21)}
    df = _corpus(spark, counts)
    got = zipf_fit(df, top_k=20).collect()[0]
    n, exp = _py_fit(counts, 20)
    assert (got.n_ranks, got.slope_micro) == (n, exp)
    assert -1_100_000 < got.slope_micro < -900_000


def test_top_k_truncation(spark):
    counts = {f"w{r:02d}": 100 - r for r in range(1, 31)}
    df = _corpus(spark, counts)
    got = zipf_fit(df, top_k=10).collect()[0]
    n, exp = _py_fit(counts, 10)
    assert (got.n_ranks, got.slope_micro) == (10, exp)


def test_degenerate_and_guard(spark):
    one = spark.createDataFrame([("hello hello hello",)], "text string")
    got = zipf_fit(one).collect()[0]
    assert (got.n_ranks, got.slope_micro) == (1, None)
    with pytest.raises(ValueError):
        zipf_fit(one, top_k=1)
