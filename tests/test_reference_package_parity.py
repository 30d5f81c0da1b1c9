"""Import the reference PACKAGE itself and machine-check the remaining
first-party pieces: the ``Dotdict`` config carrier (SURVEY 2.1) and the
package-level import behavior (SURVEY §1's verified broken-import claim).

``import debias_clip`` only resolves with the inner package directory on
sys.path (its ``__init__.py:26`` does an absolute ``from measuring_bias
import measure_bias``) — both facts are pinned below.  External deps
(`clip`, `gdown`) are stubbed; the hub module's import-time SSL bypass is
undone.  Auto-skips without the reference checkout.
"""

import importlib
import os
import pickle
import sys
import types

import pytest

REF_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_ROOT, "debias_clip", "__init__.py")),
    reason="reference checkout not present")


def _purge(mods):
    for k in list(sys.modules):
        if k == "debias_clip" or k.startswith("debias_clip.") \
                or k in ("measuring_bias", "datasets"):
            mods[k] = sys.modules.pop(k)


@pytest.fixture()
def ref_pkg(monkeypatch):
    """Import the actual reference package (inner dir on path, deps
    stubbed, SSL bypass undone); restores sys state afterwards."""
    import ssl

    pytest.importorskip("torch")
    saved_ssl = ssl._create_default_https_context
    saved_mods = {}
    _purge(saved_mods)
    stubs = {"clip": types.ModuleType("clip"),
             "gdown": types.ModuleType("gdown")}
    stubs["clip"].load = None
    stubs["clip"].tokenize = None
    stubs["gdown"].download = None
    for k, v in stubs.items():
        saved_mods.setdefault(k, sys.modules.get(k))
        sys.modules[k] = v
    monkeypatch.syspath_prepend(os.path.join(REF_ROOT, "debias_clip"))
    monkeypatch.syspath_prepend(REF_ROOT)
    try:
        pkg = importlib.import_module("debias_clip")
        yield pkg
    finally:
        ssl._create_default_https_context = saved_ssl
        _purge({})
        for k, v in saved_mods.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def test_reference_import_broken_without_inner_path(monkeypatch):
    """SURVEY §1 (verified-by-execution claim, now pinned): the reference
    package does NOT import with only the repo root on sys.path — its
    __init__.py:26 absolute-imports `measuring_bias`.  Ours imports
    normally (the fixed divergence)."""
    import ssl

    pytest.importorskip("torch")
    saved_ssl = ssl._create_default_https_context
    saved_mods = {}
    _purge(saved_mods)
    for k in ("clip", "gdown"):
        saved_mods.setdefault(k, sys.modules.get(k))
        sys.modules[k] = types.ModuleType(k)
    sys.modules["clip"].load = None
    sys.modules["clip"].tokenize = None
    sys.modules["gdown"].download = None
    monkeypatch.syspath_prepend(REF_ROOT)  # repo root ONLY
    try:
        with pytest.raises(ModuleNotFoundError, match="measuring_bias"):
            importlib.import_module("debias_clip")
    finally:
        ssl._create_default_https_context = saved_ssl
        _purge({})
        for k, v in saved_mods.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    import debias_vision_lang_tpu  # noqa: F401 — ours imports fine


class TestDotdictAgainstReference:
    """Behavior parity of our Dotdict with the executing reference class
    (reference __init__.py:4-18)."""

    def test_attr_and_item_access(self, ref_pkg):
        from debias_vision_lang_tpu.core.config import Dotdict

        for cls in (ref_pkg.Dotdict, Dotdict):
            d = cls({"A": 1})
            d.B = 2
            d["C"] = 3
            assert (d.A, d["A"], d.B, d["B"], d.C, d["C"]) == (1,) * 2 + (2,) * 2 + (3,) * 2

    def test_missing_key_is_none_not_error(self, ref_pkg):
        from debias_vision_lang_tpu.core.config import Dotdict

        assert ref_pkg.Dotdict({}).missing is None
        assert Dotdict({}).missing is None

    def test_delete_parity(self, ref_pkg):
        from debias_vision_lang_tpu.core.config import Dotdict

        for cls in (ref_pkg.Dotdict, Dotdict):
            d = cls({"A": 1})
            del d.A
            assert d.A is None and "A" not in d

    def test_pickle_roundtrip_both(self, ref_pkg):
        from debias_vision_lang_tpu.core.config import Dotdict

        for cls in (ref_pkg.Dotdict, Dotdict):
            d = cls({"A": 1, "nested": {"x": 2}})
            out = pickle.loads(pickle.dumps(d))
            assert out["A"] == 1 and out["nested"] == {"x": 2}
            assert out.A == 1  # attr access survives the round-trip

    def test_cross_construction(self, ref_pkg):
        """Our Dotdict accepts a reference Dotdict and vice versa (they are
        both plain dict subclasses)."""
        from debias_vision_lang_tpu.core.config import Dotdict

        ours = Dotdict(ref_pkg.Dotdict({"A": 1}))
        theirs = ref_pkg.Dotdict(Dotdict({"B": 2}))
        assert ours.A == 1 and theirs.B == 2

    def test_package_constants_match(self, ref_pkg):
        """Path-constant NAMES exported at the package root match
        (values differ by install location, by design)."""
        import debias_vision_lang_tpu as ours

        for name in ("DATA_PATH", "FAIRFACE_DATA_PATH", "PROMPT_DATA_PATH"):
            assert hasattr(ref_pkg, name)
            assert hasattr(ours, name)
