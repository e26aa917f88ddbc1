"""Launcher/worker round-trip of the multi-process weak-scaling harness.

The heavy sweep is a benchmark, not a test; this pins the harness
machinery — worker bootstrap, RESULT protocol, cross-process barrier —
at a tiny config.  The 2-process case exercises real jax.distributed
coordination (same transport as tests/test_multiprocess.py).
"""

import os

import pytest

from cuzk_tpu.bench import mp_scaling


def test_single_process_job():
    res = mp_scaling.run_job(1, 1, 16, 2, 1, timeout_s=600)
    assert res["suite"] == "weak_scaling_mp"
    assert res["devices"] == 1 and res["leaves"] == 16
    assert res["build_ms"] > 0 and res["leaves_per_s"] > 0


@pytest.mark.skipif(
    os.environ.get("CUZK_STRESS") != "1",
    reason="2-process jax.distributed job (~1 min); covered in spirit by "
    "tests/test_multiprocess.py — set CUZK_STRESS=1 to run",
)
def test_two_process_job_cross_process():
    res = mp_scaling.run_job(2, 1, 16, 2, 1, timeout_s=900)
    assert res["devices"] == 2
    assert res["leaves"] == 32
