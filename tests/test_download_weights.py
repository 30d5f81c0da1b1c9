"""Downloader (retry/checksum/idempotence via a local HTTP server) and the
model_loader weight-resolution chain ($DEBIAS_VLT_WEIGHTS_DIR / explicit
paths / torch state_dicts)."""

import hashlib
import http.server
import os
import threading

import numpy as np
import pytest

from debias_vision_lang_tpu.data.download import fetch


@pytest.fixture(scope="module")
def http_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("www")
    (root / "asset.bin").write_bytes(b"hello tpu world" * 100)
    server = http.server.HTTPServer(
        ("127.0.0.1", 0),
        lambda *a, **k: http.server.SimpleHTTPRequestHandler(
            *a, directory=str(root), **k),
    )
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield root, f"http://127.0.0.1:{server.server_port}"
    server.shutdown()


class TestFetch:
    def test_basic_fetch(self, http_root, tmp_path):
        root, url = http_root
        dest = str(tmp_path / "a.bin")
        out = fetch(f"{url}/asset.bin", dest, progress=False)
        assert out == dest
        assert open(dest, "rb").read() == (root / "asset.bin").read_bytes()

    def test_checksum_validated(self, http_root, tmp_path):
        root, url = http_root
        good = hashlib.sha256((root / "asset.bin").read_bytes()).hexdigest()
        dest = str(tmp_path / "b.bin")
        fetch(f"{url}/asset.bin", dest, sha256=good, progress=False)
        assert os.path.exists(dest)

    def test_checksum_mismatch_raises_and_leaves_no_file(self, http_root, tmp_path):
        _, url = http_root
        dest = str(tmp_path / "c.bin")
        with pytest.raises(RuntimeError, match="Could not download"):
            fetch(f"{url}/asset.bin", dest, sha256="0" * 64, retries=1,
                  progress=False)
        assert not os.path.exists(dest)  # no corrupt artifact left behind

    def test_idempotent_skip(self, http_root, tmp_path):
        _, url = http_root
        dest = str(tmp_path / "d.bin")
        fetch(f"{url}/asset.bin", dest, progress=False)
        mtime = os.path.getmtime(dest)
        fetch(f"{url}/asset.bin", dest, progress=False)  # no-op
        assert os.path.getmtime(dest) == mtime

    def test_corrupt_existing_refetched(self, http_root, tmp_path):
        root, url = http_root
        good = hashlib.sha256((root / "asset.bin").read_bytes()).hexdigest()
        dest = str(tmp_path / "e.bin")
        open(dest, "wb").write(b"corrupt")
        fetch(f"{url}/asset.bin", dest, sha256=good, progress=False)
        assert open(dest, "rb").read() == (root / "asset.bin").read_bytes()

    def test_404_raises_with_hint(self, http_root, tmp_path):
        _, url = http_root
        with pytest.raises(RuntimeError, match="fetch the asset manually"):
            fetch(f"{url}/missing.bin", str(tmp_path / "f.bin"), retries=1,
                  progress=False)


class TestWeightResolution:
    @pytest.fixture(scope="class")
    def npz_weights_dir(self, tmp_path_factory, tiny_clip):
        """Export tiny params as an OpenAI-named .npz under the weights dir
        convention (alias-named file)."""
        from debias_vision_lang_tpu.models.convert import to_openai_state_dict

        cfg, params = tiny_clip
        wdir = tmp_path_factory.mktemp("weights")
        sd = to_openai_state_dict(params, cfg)
        np.savez(wdir / "custom.npz", **sd)
        return str(wdir), cfg, params

    def test_explicit_npz_weights_path(self, npz_weights_dir):
        """model_loader(weights=<path.npz>) loads the exact exported params."""
        import jax

        from debias_vision_lang_tpu.models.loader import _load_weights_file

        wdir, cfg, params = npz_weights_dir
        loaded = _load_weights_file(os.path.join(wdir, "custom.npz"), cfg)
        for a, b in zip(jax.tree.leaves(loaded), jax.tree.leaves(params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    def test_torch_state_dict_pt(self, npz_weights_dir, tmp_path):
        """A torch-saved OpenAI-named state_dict loads through the same chain."""
        import jax
        import torch

        from debias_vision_lang_tpu.models.convert import to_openai_state_dict
        from debias_vision_lang_tpu.models.loader import _load_weights_file

        _, cfg, params = npz_weights_dir
        sd = {k: torch.from_numpy(np.ascontiguousarray(v))
              for k, v in to_openai_state_dict(params, cfg).items()}
        path = str(tmp_path / "model.pt")
        torch.save(sd, path)
        loaded = _load_weights_file(path, cfg)
        for a, b in zip(jax.tree.leaves(loaded), jax.tree.leaves(params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    @pytest.mark.slow  # >8s on the 1-core gate host; full suite: -m ''
    def test_weights_dir_env_resolution(self, tmp_path, monkeypatch):
        """$DEBIAS_VLT_WEIGHTS_DIR/<alias>.npz resolves for a real arch name
        (full ViT-B/32 shape, random init exported then reloaded)."""
        import jax

        from debias_vision_lang_tpu.core.registry import resolve_arch
        from debias_vision_lang_tpu.models.clip import init_clip_params
        from debias_vision_lang_tpu.models.convert import to_openai_state_dict
        from debias_vision_lang_tpu.models.loader import model_loader

        cfg = resolve_arch("openai/CLIP/ViT-B/32")
        params = init_clip_params(jax.random.key(7), cfg)
        sd = to_openai_state_dict(params, cfg)
        np.savez(tmp_path / "oai-clip-vit-b-32.npz", **sd)
        monkeypatch.setenv("DEBIAS_VLT_WEIGHTS_DIR", str(tmp_path))

        model, _, _, alias = model_loader("openai/CLIP/ViT-B/32", pretrained=True)
        assert alias == "oai-clip-vit-b-32"
        np.testing.assert_allclose(
            np.asarray(model.params["text"]["token_embedding"][:8]),
            np.asarray(params["text"]["token_embedding"][:8]), atol=1e-7)


class TestUTKFaceDownloader:
    def test_ensure_utkface_extracts_flat(self, tmp_path, monkeypatch):
        """ensure_utkface: drive archive → flat root/*.jpg layout, idempotent."""
        import io
        import tarfile

        from debias_vision_lang_tpu.data import download as dl

        # build a fake UTKFace.tar.gz with a top-level dir + a non-image file
        def fake_gdrive(url, dest):
            with tarfile.open(dest, "w:gz") as tf:
                for name in ["UTKFace/25_0_1_20170101.jpg",
                             "UTKFace/30_1_0_20170102.jpg",
                             "UTKFace/README.txt"]:
                    data = b"fakejpg" if name.endswith(".jpg") else b"doc"
                    info = tarfile.TarInfo(name)
                    info.size = len(data)
                    tf.addfile(info, io.BytesIO(data))
            return dest

        monkeypatch.setattr(dl, "fetch_gdrive", fake_gdrive)
        root = tmp_path / "utk"
        dl.ensure_utkface(str(root))
        files = sorted(p.name for p in root.iterdir())
        assert files == ["25_0_1_20170101.jpg", "30_1_0_20170102.jpg"]

        # idempotent: a second call must not re-fetch
        def boom(url, dest):
            raise AssertionError("re-fetched despite populated dir")

        monkeypatch.setattr(dl, "fetch_gdrive", boom)
        dl.ensure_utkface(str(root))

    def test_known_sha256_fallback(self, tmp_path, monkeypatch):
        """fetch() picks up a pinned digest from KNOWN_SHA256 by filename."""
        import hashlib

        from debias_vision_lang_tpu.data import download as dl

        target = tmp_path / "asset.bin"
        target.write_bytes(b"content")
        good = hashlib.sha256(b"content").hexdigest()
        monkeypatch.setitem(dl.KNOWN_SHA256, "asset.bin", good)
        # existing file with matching pinned digest → returned as-is
        assert dl.fetch("http://invalid.example/asset.bin", str(target)) == str(target)


class TestGDriveFetch:
    """fetch_gdrive's three paths: direct stream, confirm interstitial,
    HTML-masquerading payload (quota page) — all offline via monkeypatch."""

    @staticmethod
    def _fake_response(body: bytes, ctype: str):
        import email.message
        import io

        class Resp(io.BytesIO):
            def __init__(self):
                super().__init__(body)
                self.headers = email.message.Message()
                self.headers["Content-Type"] = ctype

            def __enter__(self):
                return self

            def __exit__(self, *a):
                return False

        return Resp()

    def test_direct_stream(self, tmp_path, monkeypatch):
        """Non-HTML first response is streamed to dest without a re-request."""
        import urllib.request

        from debias_vision_lang_tpu.data import download as dl

        payload = b"\x89PNGbinarypayload" * 1000
        monkeypatch.setattr(
            urllib.request, "urlopen",
            lambda req, timeout=60: self._fake_response(
                payload, "application/octet-stream"))
        monkeypatch.setattr(dl, "fetch", lambda *a, **k: pytest.fail(
            "direct response must not trigger a second fetch"))
        dest = str(tmp_path / "direct.bin")
        assert dl.fetch_gdrive("https://drive.google.com/uc?id=abc123", dest) == dest
        assert open(dest, "rb").read() == payload
        assert not os.path.exists(dest + ".part")

    def test_confirm_form_fields_forwarded(self, tmp_path, monkeypatch):
        """Interstitial HTML → confirm+uuid parsed from the form and put on
        the usercontent download URL."""
        import urllib.request

        from debias_vision_lang_tpu.data import download as dl

        html = (b'<!DOCTYPE html><html><form action="x">'
                b'<input type="hidden" name="confirm" value="tok123">'
                b'<input type="hidden" name="uuid" value="u-456">'
                b'</form></html>')
        monkeypatch.setattr(
            urllib.request, "urlopen",
            lambda req, timeout=60: self._fake_response(html, "text/html"))
        seen = {}

        def fake_fetch(url, dest, **k):
            seen["url"] = url
            open(dest, "wb").write(b"realbinary")
            return dest

        monkeypatch.setattr(dl, "fetch", fake_fetch)
        dest = str(tmp_path / "confirmed.bin")
        out = dl.fetch_gdrive("https://drive.google.com/uc?id=abc123", dest)
        assert out == dest
        assert "confirm=tok123" in seen["url"]
        assert "uuid=u-456" in seen["url"]
        assert "id=abc123" in seen["url"]

    def test_html_payload_rejected(self, tmp_path, monkeypatch):
        """A confirm-path download that still yields HTML (quota page) is
        deleted and raises an actionable error."""
        import urllib.request

        from debias_vision_lang_tpu.data import download as dl

        monkeypatch.setattr(
            urllib.request, "urlopen",
            lambda req, timeout=60: self._fake_response(
                b"<html>interstitial</html>", "text/html"))

        def fake_fetch(url, dest, **k):
            open(dest, "wb").write(b"  <html><body>quota exceeded</body>")
            return dest

        monkeypatch.setattr(dl, "fetch", fake_fetch)
        dest = str(tmp_path / "quota.bin")
        with pytest.raises(IOError, match="fetch the asset manually"):
            dl.fetch_gdrive("https://drive.google.com/uc?id=abc123", dest)
        assert not os.path.exists(dest)  # no HTML left masquerading as data

    def test_bad_url_rejected(self, tmp_path):
        from debias_vision_lang_tpu.data import download as dl

        with pytest.raises(ValueError, match="not a drive uc url"):
            dl.fetch_gdrive("https://example.com/nofileid", str(tmp_path / "x"))


class TestDownloadCLI:
    def test_unknown_target_rejected(self):
        from debias_vision_lang_tpu.data.download import main

        with pytest.raises(SystemExit, match="unknown download target"):
            main(["bogus-target"])


class TestUTKFaceStagedExtraction:
    def test_bad_tar_cleaned_up(self, tmp_path, monkeypatch):
        """A truncated/corrupt archive must not leave a partial root (the
        idempotency check is any-jpg-present) and must be deleted so the
        next call re-fetches."""
        from debias_vision_lang_tpu.data import download as dl

        def fake_gdrive(url, dest):
            open(dest, "wb").write(b"not a tar at all")
            return dest

        monkeypatch.setattr(dl, "fetch_gdrive", fake_gdrive)
        root = tmp_path / "utk"
        with pytest.raises(Exception):
            dl.ensure_utkface(str(root))
        leftovers = [p.name for p in root.iterdir()] if root.exists() else []
        assert not any(n.lower().endswith(".jpg") for n in leftovers)
        assert ".utk_partial" not in leftovers
        assert "UTKFace.tar.gz" not in leftovers  # bad archive removed
