"""Driver-side activation of the sandbox protobuf shim.

See ``tools/pyshim/sitecustomize.py`` for the mechanism. ``activate()``
must run BEFORE the SparkSession (JVM) starts: Python workers inherit
PYTHONPATH from the JVM process environment, which is frozen at JVM
launch — activating later shims the driver but not the workers.

Registration policy: queries that need protobuf at execution time
(``streaming_user_milestones``) still register only where a NATIVE
protobuf distribution exists — the external driver may build its
SparkSession before importing this package, in which case the shim
cannot reach its workers, and a registered-but-unrunnable query would
show up as a red correctness row. Inside this repo's own test suite the
shim activates at collection time (before the session fixture), so the
transformWithStateInPandas path executes end-to-end there.
"""

from __future__ import annotations

import importlib.util
import os
import sys
from pathlib import Path

_SHIM_DIR = Path(__file__).resolve().parent.parent / "tools" / "pyshim"

#: resolved once per process by activate()
_STATE: str | None = None


def native_available() -> bool:
    """True when a REAL google.protobuf runtime is importable.

    A bare non-None find_spec is not enough: Spark puts spark-core's
    jar on worker PYTHONPATHs and zipimport exposes its bundled
    ``google/protobuf`` *.proto resource dir as an empty namespace
    package (spec with no loader)."""
    try:
        spec = importlib.util.find_spec("google.protobuf")
    except (ImportError, ValueError):
        return False
    return spec is not None and spec.loader is not None


def activate() -> str:
    """Idempotently enable protobuf for this process and future Spark
    workers. Returns ``"native"`` (real install — untouched),
    ``"shimmed"`` (SDK runtime wired in), or ``"unavailable"``."""
    global _STATE
    if _STATE is not None:
        return _STATE
    if native_available():
        _STATE = "native"
        return _STATE
    shim = str(_SHIM_DIR)
    if not (_SHIM_DIR / "sitecustomize.py").is_file():
        _STATE = "unavailable"
        return _STATE
    # Workers: sitecustomize auto-imports at interpreter start.
    prev = os.environ.get("PYTHONPATH", "")
    if shim not in prev.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            shim + (os.pathsep + prev if prev else "")
        )
    # Driver (this process): same logic, applied now. Loaded by file
    # path under a private name — `import sitecustomize` could return a
    # different, already-cached interpreter-startup module.
    spec = importlib.util.spec_from_file_location(
        "_rcb_protoshim_sitecustomize", str(_SHIM_DIR / "sitecustomize.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    _STATE = "shimmed" if native_available() else "unavailable"
    return _STATE
