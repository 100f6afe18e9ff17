"""protoshim: the on-disk protobuf runtime wiring that makes
transformWithStateInPandas executable here (see protoshim.py for the
jar-namespace and gencode-skew traps)."""

from __future__ import annotations

import os
import subprocess
import sys

from reddit_can_bigdata_spark import protoshim


def test_activate_is_idempotent_and_resolves():
    state1 = protoshim.activate()
    state2 = protoshim.activate()
    assert state1 == state2
    assert state1 in ("native", "shimmed", "unavailable")


def test_shimmed_state_exports_worker_pythonpath():
    state = protoshim.activate()
    if state != "shimmed":
        return  # native install or no SDK runtime: nothing to export
    shim = str(protoshim._SHIM_DIR)
    assert shim in os.environ.get("PYTHONPATH", "").split(os.pathsep)
    assert (protoshim._SHIM_DIR / "sitecustomize.py").is_file()
    # after activation a REAL (loader-backed) runtime must import
    import google.protobuf as gp

    assert getattr(gp, "__file__", None), "namespace package leaked through"


def test_loader_guard_rejects_namespace_packages(tmp_path):
    """The spark-core jar exposes google/protobuf *.proto resources as
    a loaderless namespace package; a bare find_spec non-None check
    mistakes it for a runtime (the exact worker failure round 8 hit).
    Reproduce with a synthetic namespace package and assert the guard
    logic says no."""
    pkg = tmp_path / "fakens" / "nsdemo" / "sub"
    pkg.mkdir(parents=True)  # no __init__.py anywhere -> namespace
    code = (
        "import importlib.util, sys\n"
        f"sys.path.insert(0, {str(tmp_path / 'fakens')!r})\n"
        "spec = importlib.util.find_spec('nsdemo.sub')\n"
        "assert spec is not None          # the naive check passes...\n"
        "assert spec.loader is None       # ...but there is no runtime\n"
        "print('guard-relevant: loader is None')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=60
    )
    assert out.returncode == 0, out.stderr
    assert "loader is None" in out.stdout


def test_fresh_interpreter_full_chain():
    """In a clean subprocess: activation reaches 'shimmed' (this
    sandbox has the SDK runtime) and pyspark's StateMessage_pb2 loads
    and round-trips a message — the exact import the TWS worker
    performs."""
    code = (
        "from reddit_can_bigdata_spark.protoshim import activate\n"
        "state = activate()\n"
        "print('state', state)\n"
        "if state in ('native', 'shimmed'):\n"
        "    from pyspark.sql.streaming.proto import StateMessage_pb2 as m\n"
        "    s = m.StateRequest().SerializeToString()\n"
        "    m.StateRequest.FromString(s)\n"
        "    print('pb2 roundtrip ok')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=120,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr
    assert "state" in out.stdout
    if "shimmed" in out.stdout or "native" in out.stdout:
        assert "pb2 roundtrip ok" in out.stdout


def test_lenient_validator_accepts_only_documented_skew():
    """Round-9 advice: the shim's validator must suppress ONLY the
    same-major, gencode-at-most-one-minor-ahead skew (6.33 gencode on
    the 6.32 SDK runtime). A major-version skew — where the descriptor
    format may change — must re-raise, not pass silently."""
    code = (
        "from reddit_can_bigdata_spark.protoshim import activate\n"
        "state = activate()\n"
        "print('state', state)\n"
        "if state == 'shimmed':\n"
        "    from google.protobuf import runtime_version as rv\n"
        "    d = rv.Domain.PUBLIC\n"
        "    rv.ValidateProtobufRuntimeVersion(\n"
        "        d, rv.MAJOR, rv.MINOR + 1, 0, '', 'skew-ok')\n"
        "    print('one-minor skew accepted')\n"
        "    for maj, mino in ((rv.MAJOR + 1, 0), (rv.MAJOR, rv.MINOR + 2)):\n"
        "        try:\n"
        "            rv.ValidateProtobufRuntimeVersion(\n"
        "                d, maj, mino, 0, '', 'skew-bad')\n"
        "        except rv.VersionError:\n"
        "            print('rejected', maj, mino)\n"
        "        else:\n"
        "            raise SystemExit(f'silently passed {maj}.{mino}')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=120,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr + out.stdout
    if "shimmed" in out.stdout:
        assert "one-minor skew accepted" in out.stdout
        assert out.stdout.count("rejected") == 2
