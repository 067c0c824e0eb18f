"""Namespace bridge to a host-bundled pure-Python protobuf runtime.

This package is only ever importable when flinkexp_spark.compat.
protobuf_shim put its parent directory on ``sys.path``/``PYTHONPATH``
because no pip-installed ``google.protobuf`` exists.  It contains NO
protobuf code: it extends the ``google`` package ``__path__`` to (a) any
other ``google`` namespace portions on sys.path (google-auth,
google-api-core, ... keep resolving — a regular package would otherwise
shadow them) and (b) the pure-Python runtime that ships inside the host's
Google Cloud SDK.  It then RELAXES — not disables — the runtime/gencode
version validator: PySpark's checked-in gencode may be a MINOR version
ahead of the bundled runtime (6.33 vs 6.32), and protobuf's wire format
and generated-code API are stable across minor versions, but a MAJOR
mismatch still raises so an incompatible runtime fails loudly at import
(and the tws capability probe then reports False and queries take their
documented fallback).

If the SDK runtime is absent, ``import google.protobuf`` still fails with
ImportError and callers skip — this shim never fakes protobuf.
"""

import os
import pkgutil

# keep every other google.* namespace portion importable through this
# regular package (site-packages portions come first in sys.path order)
__path__ = pkgutil.extend_path(__path__, __name__)

_SDK_CANDIDATES = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine/google",
)

for _p in _SDK_CANDIDATES:
    if os.path.isdir(os.path.join(_p, "protobuf")) and _p not in __path__:
        __path__.append(_p)
        break

try:
    from google.protobuf import runtime_version as _rv

    _original_validate = _rv.ValidateProtobufRuntimeVersion

    # Only Spark's own gencode gets the relaxed check — every other
    # protobuf consumer in the process keeps the stock validator, so the
    # shim cannot mask a genuine version skew elsewhere.
    _RELAXED_LOCATIONS = ("org/apache/spark/", "spark/connect/")

    def _validate_major_only(
        gen_domain, gen_major, gen_minor, gen_patch, gen_suffix, location
    ):
        # tolerate minor/patch skew inside one major version for SPARK
        # gencode only (its wire format and generated-code API are stable
        # across minors); all other callers — and any major mismatch —
        # defer to the real validator, which raises.
        if gen_major == _rv.MAJOR and str(location).startswith(
            _RELAXED_LOCATIONS
        ):
            return
        _original_validate(
            gen_domain, gen_major, gen_minor, gen_patch, gen_suffix, location
        )

    _rv.ValidateProtobufRuntimeVersion = _validate_major_only
except Exception:  # no runtime found — leave import failures loud
    pass
