"""Empirically calibrate the HLL raw-estimator bias tables used by
the HyperBall sketch (operators/centrality.py).

HLL++ (Heule, Nunkesser & Hall, "HyperLogLog in Practice", EDBT 2013)
corrects the raw estimator's bias in the mid-range — between the
linear-counting regime and ~5m, where neither correction applies —
with empirically measured (raw_estimate, bias) tables and a per-p
linear-counting switch threshold. Their published tables were
measured for their hash/register setup; this script measures OURS
(idx = low p bits, rho over the remaining 64−p bits, absent register
rows = value 0), with ideal uniform 64-bit hashes — the same
assumption HLL++ makes — and writes the tables to
``unilever_scraping_etl_spark/operators/_hll_bias.py``.

Deterministic: fixed PCG64 seed, fixed grid — rerunning this script
reproduces the committed tables bit-for-bit on the same numpy.

Method, per precision p in [4, 12]:

- 28 log-spaced true cardinalities n over [m/8, 6m] (the band where
  the raw estimator is biased; below it linear counting is used,
  above it raw is unbiased);
- T(n) trials each: n ideal uniform uint64 hashes -> registers ->
  raw estimate (alpha_m * m^2 / sum 2^-M_j, absent = 2^0) and
  linear-counting estimate (m * ln(m / zeros));
- record mean raw estimate (the anchor) and mean bias (raw − n);
- the LC switch threshold is the largest anchor cardinality where
  linear counting's RMSE still beats bias-corrected raw's RMSE
  (evaluated on held-out trials from the same simulation).

Usage: python tools/calibrate_hll_bias.py  (takes ~1 min)
"""

from __future__ import annotations

import pathlib

import numpy as np

OUT = (pathlib.Path(__file__).resolve().parent.parent
       / "unilever_scraping_etl_spark" / "operators" / "_hll_bias.py")

SEED = 20260815
N_ANCHORS = 28
MAX_HASHES_PER_ANCHOR = 6_000_000  # trials * n budget
MIN_TRIALS, MAX_TRIALS = 150, 3000


def _alpha(m: int) -> float:
    return {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1.0 + 1.079 / m))


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length for uint64 (float log2 rounds wrong
    past 53 bits)."""
    x = x.copy()
    bl = np.zeros(x.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        big = x >= (np.uint64(1) << np.uint64(s))
        bl[big] += s
        x[big] >>= np.uint64(s)
    return bl + (x == 1)


def _simulate(p: int, n: int, trials: int, rng) -> tuple[np.ndarray,
                                                         np.ndarray]:
    """(raw_estimates, lc_estimates) over ``trials`` runs of true
    cardinality ``n`` — lc is NaN when no register is zero."""
    m = 1 << p
    h = rng.integers(0, 2**64, size=(trials, n), dtype=np.uint64)
    idx = (h & np.uint64(m - 1)).astype(np.int64)
    rest = h >> np.uint64(p)
    # rho in the (64-p)-bit window: 65 - p - bit_length; 0 saturates
    bl = _bit_length_u64(rest)
    rho = np.where(rest == 0, 65 - p, 65 - p - bl).astype(np.int64)
    regs = np.zeros((trials, m), dtype=np.int64)
    rows = np.repeat(np.arange(trials), n)
    np.maximum.at(regs, (rows, idx.ravel()), rho.ravel())
    s = np.power(2.0, -regs).sum(axis=1)
    raw = _alpha(m) * m * m / s
    zeros = (regs == 0).sum(axis=1)
    with np.errstate(divide="ignore"):
        lc = np.where(zeros > 0, m * np.log(m / np.maximum(zeros, 1)),
                      np.nan)
    return raw, lc


def _trials_for(n: int) -> int:
    return int(np.clip(MAX_HASHES_PER_ANCHOR // max(int(n), 1),
                       MIN_TRIALS, MAX_TRIALS))


def calibrate(p: int, rng) -> tuple[list, list, float]:
    m = 1 << p
    grid = np.unique(np.geomspace(max(2, m // 8), 6 * m,
                                  N_ANCHORS).astype(np.int64))
    # pass 1: the (mean raw, mean bias) anchor table
    anchors, biases = [], []
    for n in grid:
        raw, _ = _simulate(p, int(n), _trials_for(n), rng)
        anchors.append(float(raw.mean()))
        biases.append(float(raw.mean() - n))
    a_arr, b_arr = np.array(anchors), np.array(biases)
    # pass 2 (fresh trials): runtime-style comparison — the bias is
    # INTERPOLATED from the observed raw (clamped linear, exactly what
    # the engine expression does), which amplifies raw's noise by
    # 1 − d(bias)/d(raw) (steep in the small range: that slope is WHY
    # a per-anchor RMSE would falsely crown corrected-raw everywhere
    # and the HLL++ design keeps an LC switch). Threshold = top of the
    # contiguous low-range prefix where LC's RMSE wins.
    lc_ok_upto = 0.0
    for n in grid:
        raw, lc = _simulate(p, int(n), _trials_for(n), rng)
        corr = raw - np.interp(raw, a_arr, b_arr)
        rmse_corr = float(np.sqrt(((corr - n) ** 2).mean()))
        if np.isnan(lc).mean() >= 0.05:  # LC undefined: prefix over
            break
        rmse_lc = float(np.sqrt(np.nanmean((lc - n) ** 2)))
        if rmse_lc > rmse_corr:
            break
        lc_ok_upto = float(n)
    return anchors, biases, lc_ok_upto


def main() -> None:
    rng = np.random.Generator(np.random.PCG64(SEED))
    raw_anchors: dict[int, list] = {}
    bias_tables: dict[int, list] = {}
    lc_threshold: dict[int, float] = {}
    for p in range(4, 13):
        a, b, t = calibrate(p, rng)
        # the runtime interpolation locates segments by counting
        # anchors <= raw — strictly ascending anchors are load-bearing
        assert all(x < y for x, y in zip(a, a[1:])), \
            f"non-monotone anchors at p={p}: raise trial counts"
        raw_anchors[p], bias_tables[p], lc_threshold[p] = a, b, t
        print(f"p={p}: {len(a)} anchors, lc_threshold={t:.0f}, "
              f"peak bias={max(b):.1f} at raw~"
              f"{a[int(np.argmax(b))]:.0f}")

    def fmt(d, digits):
        lines = []
        for p, vals in d.items():
            body = ", ".join(f"{v:.{digits}f}" for v in vals)
            lines.append(f"    {p}: ({body}),")
        return "\n".join(lines)

    OUT.write_text(
        '"""GENERATED by tools/calibrate_hll_bias.py — do not edit.\n'
        "\n"
        "Empirical HLL raw-estimator bias tables for the HyperBall\n"
        "sketch, measured for THIS engine's register scheme (idx = low\n"
        "p bits of xxhash64, rho over the remaining 64-p bits) with\n"
        "ideal uniform hashes, fixed seed. RAW_ANCHORS[p] are mean raw\n"
        "estimates at log-spaced true cardinalities in [m/8, 6m];\n"
        "BIAS[p] the mean (raw - true) at each anchor; LC_THRESHOLD[p]\n"
        "the largest cardinality where linear counting's RMSE still\n"
        "beats bias-corrected raw (the HLL++ switch rule). See the\n"
        "tool docstring for the method.\n"
        '"""\n\n'
        "RAW_ANCHORS: dict[int, tuple] = {\n" + fmt(raw_anchors, 3)
        + "\n}\n\nBIAS: dict[int, tuple] = {\n" + fmt(bias_tables, 3)
        + "\n}\n\nLC_THRESHOLD: dict[int, float] = {\n"
        + "\n".join(f"    {p}: {v:.1f}," for p, v in lc_threshold.items())
        + "\n}\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
