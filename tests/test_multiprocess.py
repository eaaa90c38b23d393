"""Real multi-process bootstrap: 2 CPU processes over a localhost
coordinator run one GSPMD sharded step on a 4-device global mesh and agree
on the loss (SURVEY.md §4 item 3; round-2 VERDICT item 7 — the
``jax.distributed.initialize`` path exercised for real, not just imported).
"""
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_step():
    # Bounded by the communicate(timeout=540) below (pytest-timeout is not
    # installed in this image).
    coordinator = f"127.0.0.1:{_free_port()}"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    # A clean env for the children: the parent pytest process pins
    # xla_force_host_platform_device_count=8; children set their own (2).
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(root, "tests", "mp_worker.py"),
             coordinator, "2", str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i}: OK loss=" in out, out
