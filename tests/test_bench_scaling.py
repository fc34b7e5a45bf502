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
