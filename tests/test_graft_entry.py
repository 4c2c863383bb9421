"""Driver-contract guards for ``__graft_entry__``.

The driver invokes ``dryrun_multichip(n)`` inside a process where the
axon TPU platform may already be latched (round-1 failure mode:
MULTICHIP_r01 ``ok=false`` — the in-process backend could not be forced
back to an 8-device CPU mesh). The fix re-execs a child whose
environment strips every axon hook and pins the CPU platform; these
tests pin that child-environment construction so a refactor cannot
silently regress the one check the driver runs without us watching.
"""

import importlib.util
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "_graft_entry_for_test", os.path.join(REPO_ROOT, "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_child_env_strips_all_axon_hooks():
    g = _load_entry()
    parent = {
        "PALLAS_AXON_POOL_IPS": "127.0.0.1",
        "PALLAS_AXON_REMOTE_COMPILE": "1",
        "PALLAS_AXON_TPU_GEN": "v5e",
        "AXON_LOOPBACK_RELAY": "1",
        "JAX_PLATFORMS": "axon",
        "PATH": "/usr/bin",
    }
    env = g._dryrun_child_env(parent, 8)
    assert not any(k.startswith(("PALLAS_AXON", "AXON_")) for k in env)
    assert env["JAX_PLATFORMS"] == "cpu"
    assert env["TPU_AUDIO_DRYRUN_CHILD"] == "1"
    assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]
    assert env["PATH"] == "/usr/bin"  # unrelated vars pass through


def test_child_env_replaces_stale_device_count_flag():
    g = _load_entry()
    parent = {"XLA_FLAGS":
              "--xla_force_host_platform_device_count=2 --xla_foo=1"}
    env = g._dryrun_child_env(parent, 8)
    flags = env["XLA_FLAGS"].split()
    assert flags.count("--xla_force_host_platform_device_count=8") == 1
    assert "--xla_force_host_platform_device_count=2" not in flags
    assert "--xla_foo=1" in flags


def test_dryrun_reexecs_clean_child(monkeypatch):
    """dryrun_multichip in a latched parent must spawn a child with the
    cleaned env (captured via a stubbed subprocess.run)."""
    g = _load_entry()
    calls = {}

    class _Proc:
        returncode = 0
        stdout = ""
        stderr = ""

    def fake_run(cmd, *, env, cwd, capture_output, text, timeout):
        calls["cmd"] = cmd
        calls["env"] = env
        calls["cwd"] = cwd
        return _Proc()

    monkeypatch.setattr(g, "_dryrun_multichip_impl",
                        lambda n: (_ for _ in ()).throw(
                            AssertionError("impl must not run in parent")))
    monkeypatch.delenv("TPU_AUDIO_DRYRUN_CHILD", raising=False)
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    import subprocess

    monkeypatch.setattr(subprocess, "run", fake_run)
    g.dryrun_multichip(8)
    assert calls["cmd"][0] == sys.executable
    assert "dryrun_multichip(8)" in calls["cmd"][-1]
    assert calls["cwd"] == REPO_ROOT
    assert "PALLAS_AXON_POOL_IPS" not in calls["env"]
    assert calls["env"]["JAX_PLATFORMS"] == "cpu"


def test_dryrun_child_calls_impl_directly(monkeypatch):
    """In the child (TPU_AUDIO_DRYRUN_CHILD=1) the impl runs in-process —
    no recursive re-exec."""
    g = _load_entry()
    ran = []
    monkeypatch.setattr(g, "_dryrun_multichip_impl",
                        lambda n: ran.append(n))
    monkeypatch.setenv("TPU_AUDIO_DRYRUN_CHILD", "1")
    g.dryrun_multichip(4)
    assert ran == [4]
