"""Make ``google.protobuf`` importable without pip when possible.

``transformWithStateInPandas`` (the T7 forward path) talks to Spark's
state server over protobuf-serialized messages, so both the driver and the
Python workers must import ``google.protobuf``.  The test container has no
pip protobuf and no network, but the host's Google Cloud SDK bundles the
pure-Python protobuf runtime.  ``ensure_protobuf()`` feature-detects in
order:

1. a real installed ``google.protobuf`` — use it, no shim;
2. the bundled SDK runtime — bridge it in via ``pbshim/google`` (which
   extends the namespace path and relaxes the gencode/runtime
   minor-version validator; see that module's docstring);
3. neither — return False, callers skip.

Worker processes see the same shim because the shim directory is prepended
to ``PYTHONPATH`` — call this BEFORE the SparkSession (and its JVM) is
created so the Python-worker environment inherits it.
"""

from __future__ import annotations

import os
import sys

_SHIM_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "pbshim")
# mirror of pbshim/google/__init__.py — probed here so a missing SDK leaves
# the process environment completely untouched
_SDK_CANDIDATES = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine/google",
)


def ensure_protobuf() -> bool:
    """True if ``google.protobuf`` is importable (natively or via shim)."""
    try:
        import google.protobuf.descriptor  # noqa: F401

        return True
    except ImportError:
        pass
    if not any(
        os.path.isdir(os.path.join(p, "protobuf")) for p in _SDK_CANDIDATES
    ):
        # nothing to bridge: do NOT touch sys.path/PYTHONPATH/sys.modules —
        # installing the shim without a runtime would only shadow other
        # google.* namespace packages for no gain
        return False
    saved_parent = sys.modules.get("google")
    if saved_parent is not None:  # a half-imported 'google' would shadow the shim
        # Re-importing the parent orphans any already-loaded google.*
        # subpackages (google.auth etc. stay in sys.modules but vanish as
        # attributes of the fresh parent) — remember them so they can be
        # re-attached after the shim import.
        _loaded_subs = {
            name: mod
            for name, mod in sys.modules.items()
            if name.startswith("google.") and "." not in name[len("google."):]
        }
        del sys.modules["google"]
    else:
        _loaded_subs = {}
    if _SHIM_DIR not in sys.path:
        sys.path.insert(0, _SHIM_DIR)
    existing = os.environ.get("PYTHONPATH", "")
    if _SHIM_DIR not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            _SHIM_DIR + (os.pathsep + existing if existing else "")
        )
    try:
        import google.protobuf.descriptor  # noqa: F401

        ok = True
    except Exception:
        ok = False
        # The shim import failed; put the original parent module back so
        # ``google`` keeps resolving for other consumers.
        if saved_parent is not None and "google" not in sys.modules:
            sys.modules["google"] = saved_parent
    finally:
        # Re-attach previously-loaded subpackages to whichever parent is
        # live now (shim on success, restored original on failure) so
        # attribute access like ``google.auth`` keeps working either way.
        parent = sys.modules.get("google")
        if parent is not None:
            for name, mod in _loaded_subs.items():
                attr = name.split(".", 1)[1]
                if not hasattr(parent, attr):
                    setattr(parent, attr, mod)
    return ok
