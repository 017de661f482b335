"""Degraded-chip defense in the unattended bench (round-4 postmortem:
BENCH_r04 recorded 0.053x baseline on a sick chip while the run's own
probes said the code and the link were healthy — bench.py shipped it
silently). The verdict function is the pure core of that defense."""

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)


def test_healthy_above_threshold():
    assert bench.chip_state_verdict(0.9, 200, 1400) == "healthy"
    assert bench.chip_state_verdict(0.25, 200, 1400) == "healthy"


def test_degraded_signature_is_the_r4_capture():
    # the exact BENCH_r04 numbers: frac 0.032, demand 12 MB/s, burst 1439
    assert bench.chip_state_verdict(0.032, 12, 1439) == "degraded"


def test_link_throttle_is_not_degraded():
    # low frac but the windows demanded most of the link's burst credit:
    # resting the chip would not change anything — don't retry for it
    assert bench.chip_state_verdict(0.1, 900, 1400) == "link-throttled"
    assert bench.chip_state_verdict(0.1, 700, 1400) == "link-throttled"
