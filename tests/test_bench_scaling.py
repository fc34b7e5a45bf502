"""Unit coverage for bench.py's time-paired scaling machinery: the file
baton protocol and the per-pair ratio computation (no Spark needed)."""

import threading
import time


def test_baton_roundtrip_and_wait(tmp_path):
    import bench

    p = str(tmp_path / "baton")
    assert bench._baton_read(p) == 0  # absent file reads as 0
    bench._baton_write(p, 3)
    assert bench._baton_read(p) == 3
    # >= semantics: a turn already passed returns immediately
    assert bench._baton_wait(p, 2, timeout_s=1.0) is True
    # timeout path returns False instead of hanging
    t0 = time.time()
    assert bench._baton_wait(p, 10, timeout_s=0.5) is False
    assert time.time() - t0 < 2.0


def test_baton_two_parties_alternate(tmp_path):
    """Two threads play the lo/hi protocol: the recorded global order
    must strictly alternate party 0, party 1, party 0, ..."""
    import bench

    p = str(tmp_path / "baton")
    bench._baton_write(p, 0)
    order = []
    lock = threading.Lock()

    def party(index: int, samples: int = 3):
        for k in range(samples):
            my_turn = k * 2 + index
            assert bench._baton_wait(p, my_turn, timeout_s=10.0)
            with lock:
                order.append(index)
            bench._baton_write(p, max(bench._baton_read(p), my_turn + 1))

    threads = [threading.Thread(target=party, args=(i,)) for i in (0, 1)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert order == [0, 1, 0, 1, 0, 1]


def test_pair_ratios_and_median_semantics():
    import bench

    lo = {"score_runs": [80.0, 76.0, 90.0]}
    hi = {"score_runs": [20.0, 20.0]}  # early-broken partner: min length
    ratios = bench._pair_ratios(lo, hi, 2, 8)
    assert ratios == [1.0, 0.95]
    assert bench._pair_ratios({"score_runs": []}, hi, 2, 8) == []

def test_pair_ambients_worst_side_and_none():
    import bench

    lo = {"ambient_fracs": [0.01, 0.30, None]}
    hi = {"ambient_fracs": [0.02, 0.01]}
    # worst side per pair; missing measurement on either side -> None
    assert bench._pair_ambients(lo, hi, 3) == [0.02, 0.30, None]
    assert bench._pair_ambients({}, hi, 2) == [None, None]


def test_cpu_snapshot_attributes_own_burn():
    """The /proc subtree walk attributes THIS process's CPU to 'ours',
    so a self-burn interval reads near-zero ambient."""
    import time

    import bench

    s0 = bench._cpu_snapshot()
    if s0 is None:  # non-Linux: helper degrades to None, parent skips
        return
    t0 = time.time()
    x = 0
    while time.time() - t0 < 0.5:
        x += 1
    s1 = bench._cpu_snapshot()
    amb = bench._ambient_frac(s0, s1, 0.5)
    assert amb is not None
    # own burn must NOT read as ambient; allow the host's daemon floor
    assert amb < 0.25
    assert s1[1] - s0[1] > 20  # ~50 jiffies of our own burn visible


def test_efficiency_estimate_max_over_defensible_estimators():
    """Regression for bench run 7: the clean-pair median must never
    OVERRULE a better-measured round median (both estimators are
    biased downward by load; the max counters that), and it must
    rescue a run whose round medians are all loaded."""
    import bench

    # run-7 shape: retry round measured 0.8559; clean pairs read lower
    est, clean_med, n = bench._efficiency_estimate(
        [0.7847, 0.8559],
        [(0.7847, 0.0241), (0.984, 0.07), (0.7651, 0.0037),
         (0.7905, 0.0234), (0.9214, 0.0798)],
        0.05,
    )
    assert est == 0.8559 and clean_med == 0.7847 and n == 3

    # rescue shape: both rounds loaded, two clean pairs say 0.93
    est, clean_med, n = bench._efficiency_estimate(
        [0.74, 0.76],
        [(0.93, 0.01), (0.94, 0.02), (0.70, 0.30), (0.72, 0.25)],
        0.05,
    )
    assert est == 0.935 and n == 2

    # <2 clean pairs -> round medians only; no pairs at all -> None
    est, clean_med, n = bench._efficiency_estimate(
        [0.86], [(0.66, 0.003)], 0.05
    )
    assert est == 0.86 and clean_med is None and n == 1
    assert bench._efficiency_estimate([], [], 0.05)[0] is None
