"""Two-process sharded search: the multi-host data path, proven.

Spawns two real processes that form a 4-device global CPU mesh via
``jax.distributed.initialize`` (gloo collectives over localhost) and
run `align_arrays_sharded` against the single-device oracle — the
closest a single machine gets to a pod.  Each worker also asserts it
materialized packed payloads only for its own shards (per-host packed
memory O(database / n_hosts)); see ``tests/_mp_worker.py``.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(tmp_path, port, attempt):
    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "_mp_worker.py")
    env = dict(os.environ)
    # the workers configure XLA_FLAGS / JAX_PLATFORMS themselves;
    # scrub this process's forced device count so it doesn't double up
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(here)] + env.get("PYTHONPATH", "").split(os.pathsep)
    )
    outs = [tmp_path / f"out{attempt}_{i}.txt" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(port), str(outs[i])],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out.decode(errors="replace"))
    return procs, logs, outs


def test_two_process_sharded_equals_single_device(tmp_path):
    # _free_port closes the probe socket before the coordinator binds
    # it — a TOCTOU window in which another process can steal the
    # port.  A stolen port shows up as a coordinator bind failure, so
    # retry the whole spawn on that signature (rare; bounded).
    for attempt in range(3):
        procs, logs, outs = _run_workers(tmp_path, _free_port(), attempt)
        if any(p.returncode != 0 for p in procs) and any(
            marker in log
            for log in logs
            for marker in ("address already in use", "Address already in use")
        ):
            continue
        break
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{logs[i][-3000:]}"
    for i, out in enumerate(outs):
        text = out.read_text().strip()
        assert text.startswith("OK "), text
        _, local_b, total_b = text.split()
        # each host materialized at most half the packed payload
        assert int(local_b) * 2 <= int(total_b)
