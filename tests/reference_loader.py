"""Load the reference implementation (read-only, /root/reference) as a
TEST ORACLE for differential parity tests.

The reference package's __init__ imports modules requiring packages not
installed here (editdistance, langdetect, sklearn), so we assemble a
minimal package from only its dependency-free modules: core, utilities,
lang, string, preprocessor, coref, kb. Nothing is copied — the modules
are executed from the read-only checkout purely to compute expected
outputs inside tests (SURVEY.md §5 differential-testing strategy).
"""

from __future__ import annotations

import importlib.util
import sys
import types

REF = "/root/reference/hamerkop"
_ORDER = [
    "core", "utilities", "lang", "string", "preprocessor", "coref", "kb",
    "features", "resolver",
]
_loaded: dict | None = None


def load_reference() -> dict:
    """Returns {module_name: module} for the pure-python reference
    modules, loading them under the package name 'hamerkop_ref'."""
    global _loaded
    if _loaded is not None:
        return _loaded
    # the reference targets python>=3.5 (setup.py:25) and uses the
    # pre-3.10 collections.MutableSet/MutableMapping aliases; restore
    # them so its modules import unmodified
    import collections
    import collections.abc

    for alias in ("MutableSet", "MutableMapping", "Mapping", "Set"):
        if not hasattr(collections, alias):
            setattr(collections, alias, getattr(collections.abc, alias))
    # lang.py imports langdetect at module level; the oracle tests never
    # call the detector, so a stub module satisfies the import
    if "langdetect" not in sys.modules:
        stub = types.ModuleType("langdetect")

        class _DetectorFactory:
            seed = 0

        def _unavailable(*_a, **_k):
            raise RuntimeError("langdetect stubbed out in tests")

        stub.DetectorFactory = _DetectorFactory
        stub.detect = _unavailable
        stub.detect_langs = _unavailable
        sys.modules["langdetect"] = stub
    # features/resolver import the C `editdistance` package (not
    # installed); back it with this repo's pure-python Levenshtein so the
    # oracle computes identical values
    if "editdistance" not in sys.modules:
        from hamerkop_spark.functions.textdist import levenshtein_py

        ed = types.ModuleType("editdistance")
        ed.eval = levenshtein_py
        sys.modules["editdistance"] = ed
    pkg_name = "hamerkop_ref"
    pkg = types.ModuleType(pkg_name)
    pkg.__path__ = [REF]
    sys.modules[pkg_name] = pkg
    mods = {}
    for name in _ORDER:
        full = f"{pkg_name}.{name}"
        spec = importlib.util.spec_from_file_location(full, f"{REF}/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        mod.__package__ = pkg_name
        sys.modules[full] = mod
        spec.loader.exec_module(mod)
        setattr(pkg, name, mod)
        mods[name] = mod
    _loaded = mods
    return mods
