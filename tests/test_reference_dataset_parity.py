"""Direct parity with the REFERENCE'S OWN dataset code.

Loads ``/root/reference/debias_clip/datasets.py`` itself (read-only
checkout; `gdown` and the package import stubbed, two pandas<2 APIs
shimmed to their documented semantics) and runs its actual ``FairFace``
construction on a synthetic unbalanced corpus next to ours: the sort
order, ``_n_samples`` truncation, seed-1 ``equal_split`` sampling, final
row order, and ``gen_labels`` outputs must be identical row for row.
This machine-checks SURVEY §2.10 parity against executing reference code
rather than a transliteration.  Auto-skips without the checkout.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pandas as pd
import pytest

REF = "/root/reference/debias_clip/datasets.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF), reason="reference checkout not present")


@pytest.fixture(scope="module")
def ref_ds():
    from debias_vision_lang_tpu.core.config import Dotdict

    stubs = {}

    def stub(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        stubs[name] = m

    def _no_network(*a, **k):
        raise AssertionError("reference tried to download during the test")

    stub("debias_clip", Dotdict=Dotdict, FAIRFACE_DATA_PATH="/nonexistent")
    stub("gdown", download=_no_network)
    saved = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    try:
        spec = importlib.util.spec_from_file_location("ref_datasets", REF)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod


@pytest.fixture()
def pandas2_shims(monkeypatch):
    """The reference uses two pandas<2-only APIs (SURVEY 'known reference
    bugs'): DataFrame.append (removed in 2.0) and positional int indexing
    of a string-indexed Series (count()[0]).  Shim both to their
    documented pandas-1 semantics so the reference code EXECUTES
    unchanged; the parity-relevant logic (sort/sample/order) is
    untouched."""

    def _append(self, other, ignore_index=False):
        return pd.concat([self, other], ignore_index=ignore_index)

    monkeypatch.setattr(pd.DataFrame, "append", _append, raising=False)
    orig = pd.Series.__getitem__

    def _getitem(self, key):
        try:
            return orig(self, key)
        except (KeyError, IndexError):
            if isinstance(key, int):
                return self.iloc[key]
            raise

    monkeypatch.setattr(pd.Series, "__getitem__", _getitem)


@pytest.fixture(scope="module")
def unbalanced_fairface(tmp_path_factory):
    """Unbalanced genders (15 M / 9 F) with full race/age coverage and
    deliberately non-lexicographic CSV row order, so sort, sampling, and
    balancing all have to do real work."""
    from PIL import Image

    from debias_vision_lang_tpu.data.datasets import FairFace, IATDataset

    root = tmp_path_factory.mktemp("ref_fairface")
    img_dir = root / "imgs" / "train_val" / "val"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(11)
    races = list(FairFace.RACE_ENCODING)
    ages = list(IATDataset.AGE_ENCODING)
    rows = []
    for i in range(24):
        fname = f"val/{(i * 7) % 24}.jpg"  # scrambled order
        rows.append({
            "file": fname,
            "age": ages[i % len(ages)],
            "gender": "Male" if i % 8 else "Female",  # 21 M / 3 F... adjust
            "race": races[i % len(races)],
            "service_test": True,
        })
    # re-balance to 15 M / 9 F with full coverage
    for i, r in enumerate(rows):
        r["gender"] = "Male" if i % 8 < 5 else "Female"
    for r in rows:
        arr = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(arr).save(str(root / "imgs" / "train_val" / r["file"]))
    for mode in ("train", "val"):
        d = root / "labels" / mode
        d.mkdir(parents=True)
        pd.DataFrame(rows).to_csv(d / f"{mode}_labels.csv", index=False)
    return str(root)


def _build_pair(ref_ds, root, monkeypatch, **kw):
    from debias_vision_lang_tpu.data.datasets import FairFace

    monkeypatch.setattr(ref_ds, "FAIRFACE_DATA_PATH", root)
    ref = ref_ds.FairFace(mode="val", **kw)
    ours = FairFace(mode="val", data_path=root, download=False, **kw)
    return ref, ours


class TestFairFaceAgainstReferenceCode:
    def test_equal_split_rows_identical(self, ref_ds, unbalanced_fairface,
                                        pandas2_shims, monkeypatch):
        ref, ours = _build_pair(ref_ds, unbalanced_fairface, monkeypatch,
                                iat_type="gender")
        assert list(ref.labels["file"]) == list(ours.labels["file"])
        assert list(ref.labels["gender"]) == list(ours.labels["gender"])
        np.testing.assert_array_equal(ref.iat_labels, ours.iat_labels)
        # balanced to min-gender count, male block then female block
        assert (ref.labels["gender"] == "Male").sum() == \
               (ref.labels["gender"] == "Female").sum()

    def test_no_split_sort_order_identical(self, ref_ds, unbalanced_fairface,
                                           pandas2_shims, monkeypatch):
        ref, ours = _build_pair(ref_ds, unbalanced_fairface, monkeypatch,
                                iat_type="gender", equal_split=False)
        assert list(ref.labels["file"]) == list(ours.labels["file"])
        np.testing.assert_array_equal(ref.iat_labels, ours.iat_labels)

    @pytest.mark.parametrize("n_samples", [10, 0.5])
    def test_n_samples_truncation_identical(self, ref_ds, unbalanced_fairface,
                                            pandas2_shims, monkeypatch,
                                            n_samples):
        ref, ours = _build_pair(ref_ds, unbalanced_fairface, monkeypatch,
                                iat_type="gender", equal_split=False,
                                _n_samples=n_samples)
        assert len(ref.labels) == len(ours.labels)
        assert list(ref.labels["file"]) == list(ours.labels["file"])

    @pytest.mark.parametrize("iat_type", ["race", "age", "gender_science"])
    def test_gen_labels_identical(self, ref_ds, unbalanced_fairface,
                                  pandas2_shims, monkeypatch, iat_type):
        ref, ours = _build_pair(ref_ds, unbalanced_fairface, monkeypatch,
                                iat_type=iat_type, equal_split=False)
        np.testing.assert_array_equal(ref.iat_labels, ours.iat_labels)

    def test_getitem_sample_identical(self, ref_ds, unbalanced_fairface,
                                      pandas2_shims, monkeypatch):
        """__getitem__ parity: same Dotdict fields, same decoded image,
        same iat_label for the same index."""
        ref, ours = _build_pair(ref_ds, unbalanced_fairface, monkeypatch,
                                iat_type="gender")
        r, o = ref[3], ours[3]
        assert r.file == o.file and r.gender == o.gender
        assert int(r.iat_label) == int(o.iat_label)
        np.testing.assert_array_equal(np.asarray(r.img), np.asarray(o.img))

    def test_missing_label_assert_matches(self, ref_ds, unbalanced_fairface,
                                          pandas2_shims, monkeypatch):
        """equal_split can drop whole race classes; both implementations
        must then fail gen_labels' completeness assert the same way."""
        from debias_vision_lang_tpu.data.datasets import FairFace

        monkeypatch.setattr(ref_ds, "FAIRFACE_DATA_PATH",
                            unbalanced_fairface)
        with pytest.raises(AssertionError):
            ref_ds.FairFace(mode="val", iat_type="race", _n_samples=8)
        with pytest.raises(AssertionError):
            FairFace(mode="val", iat_type="race", _n_samples=8,
                     data_path=unbalanced_fairface, download=False)
