"""The bench harness's contention-guard helpers — pure-Python, no
Spark. The guard's steal/sys accounting is what lets a BENCH_r{N}
reading be adjudicated as hypervisor noise vs a real regression
(STATUS r13: this VM shows 15-25% steal windows and 36-72% sy storms
that loadavg cannot see), so the arithmetic itself deserves a pin.
"""

import sys

sys.path.insert(0, "/root/repo")

from bench import _cpu_ticks, _steal_pct, _sys_pct  # noqa: E402


def test_cpu_ticks_shape():
    steal, system, total = _cpu_ticks()
    assert all(isinstance(v, int) for v in (steal, system, total))
    # on Linux /proc/stat always has counted *something* by now, and
    # steal/system are components of the total
    assert total > 0
    assert 0 <= steal <= total
    assert 0 <= system <= total


def test_cpu_ticks_monotonic():
    a = _cpu_ticks()
    # burn a little CPU so the total advances even on coarse clocks
    sum(i * i for i in range(200_000))
    b = _cpu_ticks()
    assert b[-1] >= a[-1]
    assert b[0] >= a[0]
    assert b[1] >= a[1]


def test_pct_arithmetic():
    assert _steal_pct((0, 0, 0), (0, 0, 0)) == 0.0        # no time passed
    assert _steal_pct((0, 0, 1000), (0, 0, 2000)) == 0.0  # no steal
    assert _steal_pct((0, 0, 1000), (250, 0, 2000)) == 25.0
    assert _sys_pct((0, 0, 1000), (0, 500, 2000)) == 50.0
    assert _sys_pct((0, 100, 1000), (0, 100, 1000)) == 0.0  # same snapshot


def test_pct_live_window_is_a_percentage():
    a = _cpu_ticks()
    sum(i * i for i in range(200_000))
    b = _cpu_ticks()
    assert 0.0 <= _steal_pct(a, b) <= 100.0
    assert 0.0 <= _sys_pct(a, b) <= 100.0


def test_spin_probe_is_positive_and_deterministic_work():
    from bench import _spin_ms

    a = _spin_ms()
    b = _spin_ms()
    assert a > 0 and b > 0
    # two samples of identical work on one machine agree within an
    # order of magnitude (the probe flags 2x+ sustained inflation,
    # not micro-variance)
    assert max(a, b) / min(a, b) < 10
