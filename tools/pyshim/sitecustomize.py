"""Worker-side protobuf shim (auto-imported at interpreter start when
this directory is on PYTHONPATH).

This sandbox has no installed ``protobuf`` distribution, but a real
``google.protobuf`` 6.32 runtime ships inside the google-cloud-sdk
appengine platform already on disk. PySpark 4.1's
``transformWithStateInPandas`` worker protocol needs exactly that
runtime (its generated StateMessage_pb2 declares gencode 6.33, so the
strict same-minor check must be relaxed — a one-minor skew with no
descriptor-format change).

Detection subtlety: Spark puts spark-core's JAR on the worker
PYTHONPATH, and zipimport exposes the jar's bundled ``google/protobuf``
*.proto resource directory as a namespace package — so a bare
``find_spec('google.protobuf') is not None`` is TRUE in workers while
the actual Python runtime is absent (the failure mode: ``cannot import
name 'descriptor' from 'google.protobuf' (unknown location)``). A real
runtime is a regular package with a loader; only that counts.

Everything here is conditional and self-contained: when a real
``protobuf`` package is installed this module does nothing, so the
shim can stay on PYTHONPATH permanently. Activated for Spark workers
by ``reddit_can_bigdata_spark.protoshim.activate()`` prepending this
directory to PYTHONPATH before the JVM (and therefore the Python
worker pool) starts.
"""

import importlib.util
import os
import sys

_APPENGINE = "/usr/lib/google-cloud-sdk/platform/google_appengine"


def _real_protobuf_present() -> bool:
    try:
        spec = importlib.util.find_spec("google.protobuf")
    except (ImportError, ValueError):
        return False
    # namespace-package spec (e.g. the jar's .proto resource dir) has
    # no loader/origin — that is NOT a usable runtime
    return spec is not None and spec.loader is not None


if not _real_protobuf_present() and os.path.isdir(
    os.path.join(_APPENGINE, "google", "protobuf")
):
    # Appended, not prepended: a real installation or any site package
    # always wins over the SDK copy. (A regular package still beats the
    # jar's earlier namespace portion during submodule resolution.)
    if _APPENGINE not in sys.path:
        sys.path.append(_APPENGINE)
    try:
        from google.protobuf import runtime_version as _rv
    except Exception:  # SDK copy too old to have the check: nothing to relax
        pass
    else:
        _orig_validate = _rv.ValidateProtobufRuntimeVersion

        _VALIDATE_PARAMS = (
            "gen_domain", "gen_major", "gen_minor", "gen_patch",
            "gen_suffix", "location",
        )

        def _lenient_validate(*args, **kwargs):
            try:
                _orig_validate(*args, **kwargs)
            except _rv.VersionError:
                # Accept ONLY the documented skew: same major version,
                # gencode at most one minor AHEAD of the runtime (6.33
                # gencode on the SDK's 6.32 runtime — no descriptor
                # format change between adjacent minors). Any larger
                # skew (in particular a major bump, where the
                # descriptor format may change) re-raises: silently
                # passing it would surface later as opaque descriptor
                # errors inside Spark workers (round-9 advice).
                bound = dict(zip(_VALIDATE_PARAMS, args))
                bound.update(kwargs)
                gen_major = bound.get("gen_major")
                gen_minor = bound.get("gen_minor")
                if (
                    gen_major == _rv.MAJOR
                    and isinstance(gen_minor, int)
                    and 0 <= gen_minor - _rv.MINOR <= 1
                ):
                    return
                raise

        _rv.ValidateProtobufRuntimeVersion = _lenient_validate
