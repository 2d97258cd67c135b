"""Pytest gates over the round-11 differential probe batteries: every
minimized divergence from VERDICT r10 (tests/probe_r11.py) and the
stress shapes around them (tests/probe_r11b.py) byte-compared against
real SQLite through the CLI."""

import tests.probe_r11 as probe_r11
import tests.probe_r11b as probe_r11b


def test_probe_r11_verdict_shapes():
    assert probe_r11.main() == 0


def test_probe_r11b_stress_shapes():
    assert probe_r11b.main() == 0


def test_probe_r12_next_ring_shapes():
    import tests.probe_r12 as probe_r12

    assert probe_r12.main() == 0


def test_probe_r12b_stress_shapes():
    import tests.probe_r12b as probe_r12b

    assert probe_r12b.main() == 0
