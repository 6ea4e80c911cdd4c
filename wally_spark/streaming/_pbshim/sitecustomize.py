"""Interpreter-startup shim for Python worker processes (loaded only
when this directory is put on PYTHONPATH — see
wally_spark.streaming.tws.ensure_protobuf).

The transformWithState streaming runner is a FRESH python process that
imports google.protobuf during its own initialization, before any user
module can run, so the bootstrap has to happen at interpreter startup:
make the cloud-sdk-bundled pure-Python protobuf importable and relax
the gencode(6.33)/runtime(6.32) one-minor-gap check (wire format is
stable across it; a real incompatibility fails state round-trip tests
loudly). No-op when a real protobuf wheel is installed.

Gotcha this handles: Spark puts the spark-core JAR on the worker's
PYTHONPATH, and its google/protobuf/*.class directories satisfy
`import google.protobuf` as an EMPTY PEP-420 namespace package — so a
bare import probe "succeeds" uselessly. A package with __init__.py
anywhere on the path outranks namespace portions, so appending the real
runtime and purging the cached namespace modules makes the next import
resolve correctly."""

import os
import sys

_APPENGINE_PLATFORM = "/usr/lib/google-cloud-sdk/platform/google_appengine"


def _real_protobuf_present() -> bool:
    try:
        import google.protobuf as _gpb
    except ImportError:
        return False
    return getattr(_gpb, "__file__", None) is not None


if not _real_protobuf_present() and os.path.isdir(
    os.path.join(_APPENGINE_PLATFORM, "google", "protobuf")
):
    sys.path.append(_APPENGINE_PLATFORM)
    for _m in [m for m in list(sys.modules) if m == "google" or m.startswith("google.")]:
        del sys.modules[_m]
    try:
        from google.protobuf import runtime_version as _rv

        _rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
    except ImportError:
        pass
