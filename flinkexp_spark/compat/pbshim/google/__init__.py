"""Namespace bridge to a host-bundled pure-Python protobuf runtime.

This package is only ever importable when flinkexp_spark.compat.
protobuf_shim put its parent directory on ``sys.path``/``PYTHONPATH``
because no pip-installed ``google.protobuf`` exists.  It contains NO
protobuf code: it extends the ``google`` package ``__path__`` to the
pure-Python runtime that ships inside the host's Google Cloud SDK, then
relaxes the runtime/gencode version validator — PySpark's checked-in
gencode is one MINOR version ahead of the bundled runtime (6.33 vs 6.32),
and protobuf's wire format and generated-code API are stable across minor
versions; the validator is conservative, not a wire-compat boundary.

If the SDK runtime is absent, ``import google.protobuf`` still fails with
ImportError and callers skip — this shim never fakes protobuf.
"""

import os

_SDK_CANDIDATES = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine/google",
)

for _p in _SDK_CANDIDATES:
    if os.path.isdir(os.path.join(_p, "protobuf")):
        __path__.append(_p)
        break

try:
    from google.protobuf import runtime_version as _rv

    _rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
except Exception:  # no runtime found — leave import failures loud
    pass
