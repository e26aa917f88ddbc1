"""Two-process localhost CPU test of the ``jax.distributed`` entry point.

The multi-host analog of the reference's hardware-gated CUDA suites
(SURVEY.md §4): two real OS processes coordinate through
``jax.distributed.initialize``, build one global-mesh Merkle tree from
sharded leaves, and must agree bit-exactly with the single-device build.
"""

import os
import socket
import subprocess
import sys

NPROC = 2


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_build_and_proofs():
    port = _free_port()
    env = dict(os.environ)
    # Workers configure their own backend/device count (mp_worker.py);
    # the suite's 8-device XLA_FLAGS must not leak in.
    env.pop("XLA_FLAGS", None)
    worker = os.path.join(os.path.dirname(__file__), "mp_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(NPROC), str(i)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(NPROC)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        raise
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"MP_OK {i}" in out
