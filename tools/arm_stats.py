"""Exact permutation test on cross-framework Chamfer arm sets.

Reads a chamfer_midscale output JSON holding N torch arms and M ours
arms (each an independent RNG-stream draw of the same protocol from
the same shared converted init) and asks the question RUNLOG_R4's
192x288 section left open: *is the mean-vs-mean gap a systematic
framework difference, or within what stream noise can produce?*

Under the null (both frameworks draw arm metrics from the same
distribution), every relabeling of the N+M arms into groups of size
N and M is equally likely, so the p-value is the exact fraction of
the C(N+M, N) splits whose |mean difference| is >= the observed one.
No distributional assumptions — appropriate at these tiny arm counts
where a t-test's normality assumption is uncheckable.

Usage: python tools/arm_stats.py runs/CHAMFER_MIDSCALE_L_4V5.json
"""
import itertools
import json
import sys

import numpy as np


def perm_test(torch_vals, ours_vals, max_splits=2_000_000):
    a = np.asarray(torch_vals, float)
    b = np.asarray(ours_vals, float)
    pooled = np.concatenate([a, b])
    n = len(a)
    import math
    n_splits = math.comb(len(pooled), n)
    assert n_splits <= max_splits, (
        f"C({len(pooled)},{n}) = {n_splits} exhaustive splits exceeds "
        f"{max_splits}; use a Monte Carlo permutation test at this size")
    obs = abs(b.mean() - a.mean())
    idx = range(len(pooled))
    count = total = 0
    for comb in itertools.combinations(idx, n):
        mask = np.zeros(len(pooled), bool)
        mask[list(comb)] = True
        d = abs(pooled[~mask].mean() - pooled[mask].mean())
        # >= with a tiny epsilon so ties (incl. the identity split)
        # count toward p, keeping the test exact and conservative.
        count += d >= obs - 1e-12
        total += 1
    return obs, count / total, total


def sign_flip_test(diffs, max_n=24):
    """Exact paired sign-flip test on per-pair differences d_i
    (ours_i - torch_i under common random numbers). Under the null
    (no systematic framework difference) each d_i is symmetric around
    0, so all 2^n sign assignments are equally likely; p is the exact
    fraction with |mean| >= the observed |mean|. Floor: 2/2^n when
    every pair lands on the same side."""
    d = np.asarray(diffs, float)
    n = len(d)
    assert n <= max_n, f"2^{n} sign vectors is too many; sample instead"
    obs = abs(d.mean())
    count = 0
    for bits in range(2 ** n):
        signs = np.array([1.0 if (bits >> i) & 1 else -1.0
                          for i in range(n)])
        count += abs((signs * d).mean()) >= obs - 1e-12
    return obs, count / 2 ** n, 2 ** n


def paired_ci(diffs, conf=0.95):
    """Two-sided t-interval on the mean per-pair difference. At tiny
    n the exact sign-flip test's p floor (2/2^n; 0.125 at n=4) makes
    the CI the decisive statistic: it quantifies how large a
    systematic framework gap the paired data can still hide."""
    d = np.asarray(diffs, float)
    n = len(d)
    assert n >= 2, "need >=2 pairs for a CI"
    se = d.std(ddof=1) / np.sqrt(n)
    # two-sided t critical values, df = n-1 (no scipy dependency)
    t_crit = {1: 12.706, 2: 4.303, 3: 3.182, 4: 2.776, 5: 2.571,
              6: 2.447, 7: 2.365, 8: 2.306, 9: 2.262}[n - 1]
    return float(d.mean() - t_crit * se), float(d.mean() + t_crit * se)


def paired_rows(res):
    """(torch_name, ours_name) pairs by arm index from a results dict
    (arm i of each framework shares jitter seed pair_seed0+i)."""
    torch_names = sorted(n for n in res if n.startswith("torch_"))
    ours_names = sorted((n for n in res
                         if n == "ours" or n.startswith("ours_")),
                        key=lambda n: "" if n == "ours" else n)
    assert len(torch_names) == len(ours_names), \
        f"unpaired arm counts: {torch_names} vs {ours_names}"
    return list(zip(torch_names, ours_names))


def main():
    path = sys.argv[1]
    with open(path) as f:
        out = json.load(f)
    res = out["results"]
    torch_names = sorted(n for n in res if n.startswith("torch_"))
    ours_names = sorted(n for n in res if n == "ours"
                        or n.startswith("ours_"))
    assert torch_names and ours_names, (
        f"{path} has no torch_*/ours arm rows — wrong file?")
    report = {"file": path, "torch_arms": torch_names,
              "ours_arms": ours_names}
    for key in ("overall_mm", "radial_mm"):
        tv = [res[n][key] for n in torch_names]
        ov = [res[n][key] for n in ours_names]
        obs, p, total = perm_test(tv, ov)
        report[key] = {
            "torch_mean": round(float(np.mean(tv)), 4),
            "ours_mean": round(float(np.mean(ov)), 4),
            "gap_pct": round(100 * abs(np.mean(ov) - np.mean(tv))
                             / np.mean(tv), 2),
            "mean_diff_mm": round(float(obs), 4),
            "perm_p": round(float(p), 4),
            "n_splits": total,
        }
    if out.get("protocol", {}).get("paired"):
        report["paired"] = {}
        for key in ("overall_mm", "radial_mm"):
            pairs = paired_rows(res)
            d = [res[o][key] - res[t][key] for t, o in pairs]
            obs, p, total = sign_flip_test(d)
            lo, hi = paired_ci(d)
            tmean = float(np.mean([res[t][key] for t, _ in pairs]))
            report["paired"][key] = {
                "d_per_pair_mm": [round(float(x), 4) for x in d],
                "d_mean_mm": round(float(np.mean(d)), 4),
                "sign_flip_p": round(float(p), 5),
                "p_floor": round(2 / total, 5),
                "ci95_mm": [round(lo, 4), round(hi, 4)],
                "ci95_gap_pct": [round(100 * lo / tmean, 2),
                                 round(100 * hi / tmean, 2)],
                "torch_mean_mm": round(tmean, 4),
            }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
