"""NX Tables import (mirrors reference ``tests/test_reading_nx_tables.py``).

The fixture ``nxtables_ares_stage4.csv`` is the machine-generated DESY NX
Tables positioning export for ARES Stage 4 (public lattice data; same content
as the reference's ``Stage4v3_9.txt``).
"""

from pathlib import Path

import numpy as np

import lynx_tpu as lt

FIXTURE = Path(__file__).parent / "resources" / "nxtables_ares_stage4.csv"


def test_no_error():
    segment = lt.Segment.from_nx_tables(FIXTURE)
    assert isinstance(segment, lt.Segment)
    assert len(segment.elements) > 1
    assert 40.0 < float(segment.length.ravel()[0]) < 50.0


def test_length():
    """Reference-documented total length: 44.2215 m
    (reference ``tests/test_reading_nx_tables.py:25``)."""
    segment = lt.Segment.from_nx_tables(FIXTURE)
    np.testing.assert_allclose(float(segment.length.ravel()[0]), 44.2215, rtol=1e-6)


def test_gap_drifts_inserted():
    segment = lt.Segment.from_nx_tables(FIXTURE)
    drift_names = [
        el.name for el in segment.elements if el.name and el.name.startswith("DRIFT_")
    ]
    assert len(drift_names) > 10
