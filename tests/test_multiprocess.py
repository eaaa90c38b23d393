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


def _run_workers(extra_args, timeout=540):
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
             coordinator, "2", str(i), *extra_args],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return procs, outs


def test_two_process_full_train_loop(tmp_path):
    """The FULL driver under a real 2-process bootstrap (round-4 VERDICT top
    item): fast edge partition, cross-process shard_map collectives every
    step, sharded eval, process-0-only checkpoint writes, kill + resume, and
    finally a SINGLE-process resume from the 2-process checkpoint (restore
    across a process-count change — checkpoints are strategy- and
    topology-portable because they are saved unified + unpadded)."""
    ckpt = str(tmp_path / "mp_ckpt")

    # Phase 1: 2-process fresh train for 2 epochs, checkpointing as it goes.
    procs, outs = _run_workers(["full", ckpt, "train"])
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"train proc {i} failed:\n{out}"
        assert f"proc {i}: FULL train OK" in out, out
    assert os.path.exists(os.path.join(ckpt, "LightGCN_last", "meta.json"))

    # Phase 2: kill happened (processes exited); resume 2-process to epoch 4.
    procs, outs = _run_workers(["full", ckpt, "resume"])
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"resume proc {i} failed:\n{out}"
        assert f"proc {i}: FULL resume OK" in out, out

    # GSPMD branch through the full loop as well (one epoch, own dir): the
    # annotated-shardings path shares the sharded-eval and replicate-then-
    # write checkpoint machinery but none of the shard_map plumbing.
    procs, outs = _run_workers(["full", str(tmp_path / "mp_gspmd"), "gspmd"])
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"gspmd proc {i} failed:\n{out}"
        assert f"proc {i}: FULL gspmd OK" in out, out

    # Phase 3: resume ONCE MORE in this (single) process on the 8-device
    # virtual mesh — a process-count change (2 -> 1) AND a device-count
    # change (4 -> 8) against the same on-disk checkpoint.
    import json

    from gnn_ecommerce_tpu.train import TrainConfig, train
    from mp_worker import mp_prepared, mp_train_config

    base = mp_train_config(ckpt, n_devices=8, phase="resume")
    cfg = TrainConfig(**{**base.__dict__, "epochs": 5})
    result = train(mp_prepared(), cfg, verbose=False)
    assert [h["epoch"] for h in result.history] == [4], result.history
    with open(os.path.join(ckpt, "LightGCN_last", "meta.json")) as f:
        assert json.load(f)["epoch"] == 4


def test_two_process_cli_train(tmp_path):
    """The day-0 multi-host COMMAND LINE: two processes each launch
    ``python -m gnn_ecommerce_tpu.cli.train --coordinator ...`` and train one
    epoch over the joint 4-device mesh with the fast edge partition. The
    children drop the axon plugin from PYTHONPATH so JAX_PLATFORMS=cpu is
    honored (the CLI itself never forces a backend — on a real slice it must
    see the TPUs)."""
    coordinator = f"127.0.0.1:{_free_port()}"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = root
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "gnn_ecommerce_tpu.cli.train",
             "--synthetic", "-e", "1", "--synthetic-users", "200",
             "--synthetic-items", "50", "--synthetic-events", "4000",
             "--mesh", "4", "--partition", "edge", "--fast", "f32",
             "--coordinator", coordinator, "--num-processes", "2",
             "--process-id", str(i)],
            cwd=str(tmp_path), env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
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
        assert p.returncode == 0, f"cli proc {i} failed:\n{out}"
        assert "done: best epoch" in out, out
    # Process 0 wrote the artifacts; process 1 did not duplicate them.
    assert os.path.exists(
        os.path.join(str(tmp_path), "model-checkpoints", "LightGCN_best",
                     "meta.json")
    )
    assert "distributed: {'process_index': 0" in outs[0]
    assert "distributed: {'process_index': 1" in outs[1]


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
