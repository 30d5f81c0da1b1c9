"""Serving subsystem: micro-batcher semantics, engine bucketing, HTTP API."""

import base64
import io
import json
import threading
import time
import urllib.request

import jax
import numpy as np
import pytest
from PIL import Image

from debias_vision_lang_tpu.core.config import (
    CLIPConfig, DebiasConfig, TextConfig, VisionConfig)
from debias_vision_lang_tpu.models.clip import init_clip_params
from debias_vision_lang_tpu.models.debias import DebiasCLIP, init_debias_tokens
from debias_vision_lang_tpu.serve import (
    InferenceEngine, MicroBatcher, ServeApp, make_server)
from debias_vision_lang_tpu.text.tokenizer import ClipTokenizer

N_PX = 32
CTX = 16


@pytest.fixture(scope="module")
def engine():
    tok = ClipTokenizer([("t", "h"), ("th", "e</w>")], context_length=CTX)
    cfg = CLIPConfig(
        name="tiny-serve",
        vision=VisionConfig(kind="vit", image_size=N_PX, patch_size=16,
                            width=32, layers=2, heads=2, embed_dim=16),
        text=TextConfig(vocab_size=tok.vocab_size, context_length=CTX,
                        width=32, layers=2, heads=2, embed_dim=16),
    )
    params = init_clip_params(jax.random.key(0), cfg)
    dcfg = DebiasConfig(num_debias_tokens=2, hidden_dim=32, max_tokens=CTX)
    deb = init_debias_tokens(jax.random.key(1), params, dcfg, tokenizer=None)
    model = DebiasCLIP(clip_params=params, debias_tokens=deb,
                       clip_cfg=cfg, debias_cfg=dcfg)
    return InferenceEngine(model, tok, max_batch=8)


def _jpeg_bytes(rng, h=48, w=40):
    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 256, (h, w, 3), dtype=np.uint8)).save(
        buf, format="JPEG", quality=92)
    return buf.getvalue()


class TestMicroBatcher:
    def test_order_and_results(self):
        calls = []

        def run(items):
            calls.append(len(items))
            return [x * 2 for x in items]

        mb = MicroBatcher(run, max_batch=4, max_wait_ms=20)
        futs = [mb.submit(i) for i in range(10)]
        assert [f.result(timeout=5) for f in futs] == [2 * i for i in range(10)]
        mb.close()
        assert sum(calls) == 10
        assert max(calls) <= 4

    def test_coalescing(self):
        """Concurrent submits inside the window share a device call."""
        calls = []

        def run(items):
            calls.append(len(items))
            return items

        mb = MicroBatcher(run, max_batch=16, max_wait_ms=200)
        futs = []
        barrier = threading.Barrier(6)

        def client(i):
            barrier.wait()
            futs.append(mb.submit(i))

        threads = [threading.Thread(target=client, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for f in list(futs):
            f.result(timeout=5)
        mb.close()
        assert max(calls) > 1  # at least one multi-item batch formed

    def test_exception_propagates_per_batch(self):
        def run(items):
            raise RuntimeError("boom")

        mb = MicroBatcher(run, max_batch=4, max_wait_ms=5)
        fut = mb.submit(1)
        with pytest.raises(RuntimeError, match="boom"):
            fut.result(timeout=5)
        mb.close()

    def test_wrong_result_count_is_an_error(self):
        mb = MicroBatcher(lambda items: items[:-1] if len(items) > 1 else [],
                          max_batch=4, max_wait_ms=5)
        fut = mb.submit(1)
        with pytest.raises(RuntimeError, match="returned"):
            fut.result(timeout=5)
        mb.close()

    def test_close_drains(self):
        mb = MicroBatcher(lambda items: items, max_batch=4, max_wait_ms=5)
        futs = [mb.submit(i) for i in range(3)]
        mb.close()
        assert [f.result(timeout=1) for f in futs] == [0, 1, 2]
        with pytest.raises(RuntimeError):
            mb.submit(9)


class TestDecodeImageBytes:
    def test_native_jpeg_path_needs_no_pil(self, rng, monkeypatch):
        """The documented native-only decode contract: a decodable JPEG
        never touches PIL when the native runtime is built (round-3
        review fix — the header check used to Image.open every payload)."""
        import sys

        from debias_vision_lang_tpu import native
        from debias_vision_lang_tpu.serve.engine import decode_image_bytes

        if not native.available():
            pytest.skip("native ingest unavailable")
        data = _jpeg_bytes(rng)
        monkeypatch.setitem(sys.modules, "PIL", None)  # import PIL → error
        monkeypatch.setitem(sys.modules, "PIL.Image", None)
        out = decode_image_bytes(data)
        assert out.shape == (48, 40, 3) and out.dtype == np.uint8

    def test_decode_cap_enforced_before_native_decode(self, rng, monkeypatch):
        from debias_vision_lang_tpu import serve
        from debias_vision_lang_tpu.serve import engine as engine_mod

        monkeypatch.setattr(engine_mod, "MAX_DECODE_PIXELS", 100)
        with pytest.raises(ValueError, match="decode limit"):
            engine_mod.decode_image_bytes(_jpeg_bytes(rng))

    def test_pil_fallback_single_parse(self, rng):
        """Non-JPEG (PNG) still decodes through PIL, parsed once."""
        import io as _io

        from PIL import Image

        from debias_vision_lang_tpu.serve.engine import decode_image_bytes

        arr = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
        buf = _io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        out = decode_image_bytes(buf.getvalue())
        np.testing.assert_array_equal(out, arr)


class TestEngine:
    def test_bucket_padding_matches_direct(self, engine, rng):
        """Padded-bucket results must equal the unpadded forward."""
        imgs = [rng.integers(0, 256, (N_PX, N_PX, 3), dtype=np.uint8)
                for _ in range(3)]  # pads to bucket 4
        out = engine.embed_image_arrays(imgs)
        assert out.shape == (3, 16)
        import jax.numpy as jnp

        from debias_vision_lang_tpu.vision.preprocess import preprocess_batch

        x = preprocess_batch(jnp.asarray(np.stack(imgs)), N_PX)
        direct = np.asarray(engine.model.encode_image(
            x, dtype=engine.compute_dtype).astype(jnp.float32))
        np.testing.assert_allclose(out, direct, rtol=1e-5, atol=1e-6)

    def test_text_roundtrip(self, engine):
        out = engine.embed_token_arrays(list(engine.tokenize(["the", "the the"])))
        assert out.shape == (2, 16)
        assert np.isfinite(out).all()

    def test_prepare_image_decodes_and_crops(self, engine, rng):
        u8 = engine.prepare_image(_jpeg_bytes(rng))
        assert u8.shape == (N_PX, N_PX, 3) and u8.dtype == np.uint8

    def test_score_is_softmax(self, engine, rng):
        img = engine.embed_image_arrays(
            [rng.integers(0, 256, (N_PX, N_PX, 3), dtype=np.uint8)])
        txt = engine.embed_token_arrays(list(engine.tokenize(["a", "b", "c"])))
        probs = engine.score(img, txt)
        assert probs.shape == (1, 3)
        np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)

    def test_wrong_image_shape_rejected(self, engine, rng):
        with pytest.raises(ValueError, match="expected"):
            engine.embed_image_arrays(
                [rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)])

    def test_prepare_images_batch_matches_per_record(self, engine, rng):
        """The one-native-call batch chain must equal the per-record path
        bit-for-bit (same decode, same PIL-exact resize/crop)."""
        records = [_jpeg_bytes(rng), _jpeg_bytes(rng, 96, 64),
                   _jpeg_bytes(rng, 40, 120)]
        batch = engine.prepare_images_batch(records)
        for got, rec in zip(batch, records):
            np.testing.assert_array_equal(got, engine.prepare_image(rec))

    def test_prepare_images_batch_bad_record(self, engine, rng):
        with pytest.raises(ValueError, match="undecodable"):
            engine.prepare_images_batch([_jpeg_bytes(rng), b"not an image"])

    def test_prepare_images_batch_oversized_record(self, engine, rng,
                                                   monkeypatch):
        from debias_vision_lang_tpu.serve import engine as engine_mod

        monkeypatch.setattr(engine_mod, "MAX_DECODE_PIXELS", 100)
        with pytest.raises(ValueError, match="oversized|exceeds"):
            engine.prepare_images_batch([_jpeg_bytes(rng)])


class TestEngineStaged:
    """The bf16/int8 rungs stage patch-contiguous buckets; the native
    raw-JPEG ingest emits that layout directly at decode time."""

    @pytest.fixture(scope="class")
    def staged_engine(self):
        cfg = CLIPConfig(
            name="tiny-staged",
            vision=VisionConfig(kind="vit", image_size=N_PX, patch_size=16,
                                width=32, layers=2, heads=2, embed_dim=16),
            text=TextConfig(vocab_size=64, context_length=CTX,
                            width=32, layers=2, heads=2, embed_dim=16),
        )
        from debias_vision_lang_tpu.models.loader import CLIP

        model = CLIP(params=init_clip_params(jax.random.key(0), cfg), cfg=cfg)
        return InferenceEngine(model, None, max_batch=8,
                               compute_dtype="bfloat16")

    def test_staged_items_match_hwc(self, staged_engine, rng):
        from debias_vision_lang_tpu.vision.preprocess import patchify_u8

        assert staged_engine._patch == 16
        frames = [rng.integers(0, 256, (N_PX, N_PX, 3), dtype=np.uint8)
                  for _ in range(3)]
        staged = list(patchify_u8(np.stack(frames), 16))
        np.testing.assert_array_equal(
            staged_engine.embed_image_arrays(frames),
            staged_engine.embed_image_arrays(staged))

    def test_mixed_staged_and_hwc(self, staged_engine, rng):
        from debias_vision_lang_tpu.vision.preprocess import patchify_u8

        frames = [rng.integers(0, 256, (N_PX, N_PX, 3), dtype=np.uint8)
                  for _ in range(4)]
        mixed = [frames[0], patchify_u8(np.stack(frames[1:2]), 16)[0],
                 frames[2], patchify_u8(np.stack(frames[3:4]), 16)[0]]
        np.testing.assert_array_equal(
            staged_engine.embed_image_arrays(frames),
            staged_engine.embed_image_arrays(mixed))

    def test_prepare_images_batch_emits_staging(self, staged_engine, rng):
        from debias_vision_lang_tpu import native

        if not native.available():
            pytest.skip("native ingest unavailable")
        records = [_jpeg_bytes(rng), _jpeg_bytes(rng, 80, 56)]
        batch = staged_engine.prepare_images_batch(records)
        g = N_PX // 16
        for got, rec in zip(batch, records):
            assert got.shape == (g * g, 16 * 16 * 3)
            from debias_vision_lang_tpu.vision.preprocess import patchify_u8

            np.testing.assert_array_equal(
                got,
                patchify_u8(staged_engine.prepare_image(rec)[None], 16)[0])

    def test_raw_jpeg_staged_end_to_end(self, staged_engine, rng):
        """Raw-JPEG embeddings through the staged native chain equal the
        HWC dispatch on the same frames."""
        records = [_jpeg_bytes(rng), _jpeg_bytes(rng, 64, 96)]
        batch = staged_engine.prepare_images_batch(records)
        frames = [staged_engine.prepare_image(r) for r in records]
        np.testing.assert_array_equal(
            staged_engine.embed_image_arrays(batch),
            staged_engine.embed_image_arrays(frames))


class TestHTTP:
    @pytest.fixture(scope="class")
    def server(self, engine):
        app = ServeApp(engine, max_wait_ms=2.0)
        httpd = make_server(app, port=0)
        thread = threading.Thread(target=httpd.serve_forever, daemon=True)
        thread.start()
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        yield base
        httpd.shutdown()
        httpd.server_close()
        app.close()

    def _post(self, url, payload):
        req = urllib.request.Request(
            url, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=30) as resp:
                return resp.status, json.loads(resp.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    def test_healthz(self, server):
        with urllib.request.urlopen(server + "/healthz", timeout=10) as resp:
            info = json.loads(resp.read())
        assert info["status"] == "ok"
        assert info["model"] == "tiny-serve"
        assert info["n_px"] == N_PX

    def test_embed_text(self, server):
        code, out = self._post(server + "/v1/embed/text",
                               {"texts": ["the", "the the"]})
        assert code == 200
        embs = np.asarray(out["embeddings"])
        assert embs.shape == (2, 16) and np.isfinite(embs).all()

    def test_embed_image_and_score(self, server, engine, rng):
        b64 = base64.b64encode(_jpeg_bytes(rng)).decode()
        code, out = self._post(server + "/v1/embed/image", {"images_b64": [b64]})
        assert code == 200
        assert np.asarray(out["embeddings"]).shape == (1, 16)

        code, out = self._post(server + "/v1/score",
                               {"image_b64": b64, "texts": ["the", "the the"]})
        assert code == 200
        probs = np.asarray(out["probs"])
        assert probs.shape == (2,)
        np.testing.assert_allclose(probs.sum(), 1.0, rtol=1e-5)

    def test_bad_route_404(self, server):
        code, out = self._post(server + "/v1/nope", {})
        assert code == 404

    def test_bad_payload_400(self, server):
        code, out = self._post(server + "/v1/embed/text", {"texts": []})
        assert code == 400
        code, out = self._post(server + "/v1/embed/image", {"images_b64": "x"})
        assert code == 400

    def test_overlong_text_400(self, server):
        """Text past the context length is a client error (the tokenizer
        raises RuntimeError; the payload boundary maps it to 400)."""
        code, out = self._post(server + "/v1/embed/text",
                               {"texts": ["the " * 100]})
        assert code == 400
        assert "error" in out

    def test_undecodable_image_400_not_crash(self, server):
        """Undecodable image bytes are a CLIENT error (400, not 500 — a
        health-based LB must not eject an instance over malformed input)."""
        bad = base64.b64encode(b"notanimage").decode()
        code, out = self._post(server + "/v1/embed/image",
                               {"images_b64": [bad]})
        assert code == 400
        # server still alive
        with urllib.request.urlopen(server + "/healthz", timeout=10) as resp:
            assert resp.status == 200

    def _post_raw(self, url, body, headers):
        req = urllib.request.Request(url, data=body, headers=headers)
        try:
            with urllib.request.urlopen(req, timeout=30) as resp:
                return resp.status, dict(resp.headers), resp.read()
        except urllib.error.HTTPError as e:
            return e.code, dict(e.headers), e.read()

    def test_raw_u8_batch(self, server, rng):
        """Raw uint8 frames in, raw f32 embeddings out — and identical to
        the engine's own answer for the same pixels."""
        frames = rng.integers(0, 256, (3, N_PX, N_PX, 3), dtype=np.uint8)
        code, hdrs, body = self._post_raw(
            server + "/v1/embed/image-raw", frames.tobytes(),
            {"Content-Type": "application/octet-stream",
             "X-Image-Format": "u8"})
        assert code == 200, body
        assert hdrs["Content-Type"] == "application/octet-stream"
        n, dim = int(hdrs["X-Count"]), int(hdrs["X-Dim"])
        embs = np.frombuffer(body, "<f4").reshape(n, dim)
        assert embs.shape == (3, 16) and np.isfinite(embs).all()

    def test_raw_u8_matches_engine(self, server, engine, rng):
        frame = rng.integers(0, 256, (N_PX, N_PX, 3), dtype=np.uint8)
        _, _, body = self._post_raw(
            server + "/v1/embed/image-raw", frame.tobytes(),
            {"Content-Type": "application/octet-stream",
             "X-Image-Format": "u8"})
        via_http = np.frombuffer(body, "<f4").reshape(1, -1)
        direct = engine.embed_image_arrays([frame])
        np.testing.assert_allclose(via_http, direct, atol=1e-5)

    def test_raw_jpeg_stream(self, server, engine, rng):
        """Length-prefixed JPEG records decode to the same embeddings as the
        base64 JSON path."""
        jb = _jpeg_bytes(rng)
        stream = len(jb).to_bytes(4, "big") + jb
        code, hdrs, body = self._post_raw(
            server + "/v1/embed/image-raw", stream,
            {"Content-Type": "application/octet-stream",
             "X-Image-Format": "jpeg"})
        assert code == 200, body
        raw_embs = np.frombuffer(body, "<f4").reshape(1, -1)
        b64 = base64.b64encode(jb).decode()
        _, out = self._post(server + "/v1/embed/image", {"images_b64": [b64]})
        np.testing.assert_allclose(raw_embs, np.asarray(out["embeddings"]),
                                   atol=1e-5)

    def test_raw_json_accept(self, server, rng):
        frame = rng.integers(0, 256, (N_PX, N_PX, 3), dtype=np.uint8)
        code, hdrs, body = self._post_raw(
            server + "/v1/embed/image-raw", frame.tobytes(),
            {"Content-Type": "application/octet-stream",
             "X-Image-Format": "u8", "Accept": "application/json"})
        assert code == 200
        out = json.loads(body)
        assert np.asarray(out["embeddings"]).shape == (1, 16)

    def test_raw_errors(self, server):
        # wrong frame size
        code, _, body = self._post_raw(
            server + "/v1/embed/image-raw", b"\x00" * 17,
            {"Content-Type": "application/octet-stream",
             "X-Image-Format": "u8"})
        assert code == 400 and b"multiple" in body
        # unknown format
        code, _, body = self._post_raw(
            server + "/v1/embed/image-raw", b"\x00" * 4,
            {"Content-Type": "application/octet-stream",
             "X-Image-Format": "png"})
        assert code == 400
        # truncated jpeg record
        code, _, body = self._post_raw(
            server + "/v1/embed/image-raw", (1000).to_bytes(4, "big") + b"xx",
            {"Content-Type": "application/octet-stream",
             "X-Image-Format": "jpeg"})
        assert code == 400

    def test_non_string_elements_400(self, server):
        """Non-string payload elements are CLIENT errors — TypeError from
        b64decode/tokenizer used to surface as 500."""
        code, out = self._post(server + "/v1/embed/image",
                               {"images_b64": [42]})
        assert code == 400 and "strings" in out["error"]
        code, out = self._post(server + "/v1/embed/text", {"texts": [42]})
        assert code == 400 and "strings" in out["error"]

    def test_item_count_cap_400(self, server, rng):
        """MAX_BODY_BYTES caps the wire body but not decoded memory: a sea
        of tiny records must hit the per-request item cap, not expand to
        item_count x n_px^2 x 3 host arrays."""
        from debias_vision_lang_tpu.serve.server import MAX_ITEMS_PER_REQUEST

        n = MAX_ITEMS_PER_REQUEST + 1
        b64 = base64.b64encode(_jpeg_bytes(rng)).decode()
        code, out = self._post(server + "/v1/embed/image",
                               {"images_b64": [b64] * n})
        assert code == 400 and "limit" in out["error"]
        # length-prefixed JPEG stream path too
        jb = _jpeg_bytes(rng)
        stream = (len(jb).to_bytes(4, "big") + jb) * n
        code2, _, body = self._post_raw(
            server + "/v1/embed/image-raw", stream,
            {"Content-Type": "application/octet-stream",
             "X-Image-Format": "jpeg"})
        assert code2 == 400 and b"limit" in body

    def test_oversized_dimensions_400(self, server, rng):
        """A crafted JPEG whose header declares enormous dimensions must be
        rejected from the HEADER (before any pixel decode allocates
        h*w*3) — the native decode path has no PIL bomb guard."""
        jb = bytearray(_jpeg_bytes(rng))
        i = jb.find(b"\xff\xc0")  # SOF0: [marker][len][prec][H:2][W:2]
        assert i > 0
        jb[i + 5:i + 7] = (65500).to_bytes(2, "big")
        jb[i + 7:i + 9] = (65500).to_bytes(2, "big")
        b64 = base64.b64encode(bytes(jb)).decode()
        code, out = self._post(server + "/v1/embed/image",
                               {"images_b64": [b64]})
        assert code == 400
        assert "pixel" in out["error"] or "exceeds" in out["error"]

    def test_keepalive_two_requests_one_connection(self, server):
        """HTTP/1.1 keep-alive: consecutive requests ride one TCP
        connection (every response carries Content-Length)."""
        import http.client

        host, port = server.replace("http://", "").split(":")
        conn = http.client.HTTPConnection(host, int(port), timeout=30)
        try:
            for _ in range(2):
                conn.request("GET", "/healthz")
                resp = conn.getresponse()
                assert resp.status == 200
                json.loads(resp.read())
        finally:
            conn.close()

    def test_get_with_body_keeps_connection_synchronized(self, server):
        """A GET carrying a body (legal, if unusual) must be drained
        before responding, or the leftover bytes parse as the next
        request line and wreck the keep-alive connection (round-3 review
        fix)."""
        import http.client

        host, port = server.replace("http://", "").split(":")
        conn = http.client.HTTPConnection(host, int(port), timeout=30)
        try:
            conn.request("GET", "/healthz", body=b"x" * 120)
            resp = conn.getresponse()
            assert resp.status == 200
            resp.read()
            # same connection must still speak clean HTTP
            conn.request("GET", "/healthz")
            resp = conn.getresponse()
            assert resp.status == 200
            json.loads(resp.read())
        finally:
            conn.close()

    def test_stats_time_device_work(self, server, rng):
        """run_seconds must cover the blocking fetch, not just the ~free
        async dispatch (two-stage batching)."""
        b64 = base64.b64encode(_jpeg_bytes(rng)).decode()
        code, _ = self._post(server + "/v1/embed/image", {"images_b64": [b64]})
        assert code == 200
        with urllib.request.urlopen(server + "/healthz", timeout=10) as resp:
            stats = json.loads(resp.read())["image_batches"]
        assert stats["batches"] >= 1 and stats["run_seconds"] > 0

    def test_raw_corrupt_jpeg_record_400(self, server):
        """A well-framed but undecodable JPEG record is a CLIENT error:
        PIL's UnidentifiedImageError/OSError must normalize to 400 like the
        base64 path, not surface as a 500."""
        bad = b"\xff\xd8notactuallyajpeg" * 3  # JPEG magic, garbage body
        stream = len(bad).to_bytes(4, "big") + bad
        code, _, body = self._post_raw(
            server + "/v1/embed/image-raw", stream,
            {"Content-Type": "application/octet-stream",
             "X-Image-Format": "jpeg"})
        assert code == 400 and b"undecodable" in body
        with urllib.request.urlopen(server + "/healthz", timeout=10) as resp:
            assert resp.status == 200

    def test_raw_bad_content_length_400(self, server):
        """A malformed Content-Length header must get a 400, not abort the
        connection with an unhandled ValueError."""
        import http.client

        host, port = server.replace("http://", "").split(":")
        conn = http.client.HTTPConnection(host, int(port), timeout=30)
        try:
            conn.putrequest("POST", "/v1/embed/image-raw",
                            skip_accept_encoding=True)
            conn.putheader("Content-Type", "application/octet-stream")
            conn.putheader("X-Image-Format", "u8")
            conn.putheader("Content-Length", "abc")
            conn.endheaders()
            resp = conn.getresponse()
            assert resp.status == 400
            assert b"Content-Length" in resp.read()
        finally:
            conn.close()

    def test_concurrent_clients_coalesce(self, server, rng):
        """6 parallel single-text requests → identical to serial answers."""
        texts = [f"the{'!' * i}" for i in range(6)]
        results = [None] * 6

        def client(i):
            _, out = self._post(server + "/v1/embed/text",
                                {"texts": [texts[i]]})
            results[i] = np.asarray(out["embeddings"])[0]

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        _, serial = self._post(server + "/v1/embed/text", {"texts": texts})
        np.testing.assert_allclose(
            np.stack(results), np.asarray(serial["embeddings"]),
            rtol=1e-4, atol=1e-5)


class TestPipelinedBatcher:
    def test_two_stage_results_and_order(self):
        import numpy as np

        def dispatch(items):  # pretend-async handle: padded array
            return np.asarray(items + [0] * (4 - len(items)))

        def finalize(handle, n):
            return handle[:n] * 10

        mb = MicroBatcher(dispatch, finalize=finalize, max_batch=4,
                          max_wait_ms=10)
        futs = [mb.submit(i) for i in range(9)]
        assert [int(f.result(timeout=5)) for f in futs] == [10 * i
                                                            for i in range(9)]
        mb.close()
        assert mb.stats["items"] == 9

    def test_finalize_exception_propagates(self):
        def finalize(handle, n):
            raise ValueError("fetch died")

        mb = MicroBatcher(lambda items: items, finalize=finalize,
                          max_batch=4, max_wait_ms=5)
        fut = mb.submit(1)
        with pytest.raises(ValueError, match="fetch died"):
            fut.result(timeout=5)
        mb.close()

    def test_close_drains_pipeline(self):
        import numpy as np

        mb = MicroBatcher(lambda items: np.asarray(items),
                          finalize=lambda h, n: h[:n],
                          max_batch=2, max_wait_ms=5)
        futs = [mb.submit(i) for i in range(5)]
        mb.close()
        assert [int(f.result(timeout=1)) for f in futs] == list(range(5))


class TestReviewFixes:
    """Regressions from the round-2 code review of the serve subsystem."""

    def test_non_pow2_max_batch_normalized(self, engine):
        from debias_vision_lang_tpu.serve.engine import InferenceEngine

        e = InferenceEngine(engine.model, engine.tokenizer, max_batch=6)
        assert e.max_batch == 8  # warmup set == runtime bucket cap

    def test_oversize_input_chunks(self, engine, rng):
        """>max_batch inputs chunk into bucket-sized launches, same result."""
        imgs = [rng.integers(0, 256, (N_PX, N_PX, 3), dtype=np.uint8)
                for _ in range(engine.max_batch * 2 + 3)]
        out = engine.embed_image_arrays(imgs)
        assert out.shape == (len(imgs), 16)
        per_chunk = np.concatenate([
            engine.embed_image_arrays(imgs[:engine.max_batch]),
            engine.embed_image_arrays(imgs[engine.max_batch:]),
        ])
        np.testing.assert_allclose(out, per_chunk, rtol=1e-6)

    def test_dispatch_rejects_oversize(self, engine, rng):
        imgs = [rng.integers(0, 256, (N_PX, N_PX, 3), dtype=np.uint8)
                for _ in range(engine.max_batch + 1)]
        with pytest.raises(ValueError, match="exceeds max_batch"):
            engine.dispatch_image_arrays(imgs)

    def test_empty_input(self, engine):
        assert engine.embed_image_arrays([]).shape == (0, 16)

    def test_body_size_cap_413(self, engine):
        from debias_vision_lang_tpu.serve import server as srv

        app = ServeApp(engine, max_wait_ms=2.0)
        httpd = make_server(app, port=0)
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        try:
            req = urllib.request.Request(
                base + "/v1/embed/text", data=b"{}",
                headers={"Content-Type": "application/json",
                         "Content-Length": str(srv.MAX_BODY_BYTES + 1)})
            with pytest.raises(urllib.error.HTTPError) as exc:
                urllib.request.urlopen(req, timeout=10)
            assert exc.value.code == 413
        finally:
            httpd.shutdown()
            httpd.server_close()
            app.close()


class TestMeshServing:
    """DP serving over the 8-device virtual CPU mesh."""

    @pytest.fixture(scope="class")
    def mesh_engine(self, engine):
        from debias_vision_lang_tpu.parallel.mesh import create_mesh
        from debias_vision_lang_tpu.serve.engine import InferenceEngine

        mesh = create_mesh((8, 1))
        return InferenceEngine(engine.model, engine.tokenizer, max_batch=16,
                               mesh=mesh)

    def test_min_bucket_is_data_size(self, mesh_engine):
        assert mesh_engine.min_bucket == 8

    def test_matches_single_device(self, engine, mesh_engine, rng):
        imgs = [rng.integers(0, 256, (N_PX, N_PX, 3), dtype=np.uint8)
                for _ in range(11)]  # pads to bucket 16 on the mesh
        single = engine.embed_image_arrays(imgs)
        sharded = mesh_engine.embed_image_arrays(imgs)
        np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-6)

    def test_text_matches_single_device(self, engine, mesh_engine):
        toks = list(engine.tokenize(["the", "the the", "the the the"]))
        np.testing.assert_allclose(
            mesh_engine.embed_token_arrays(toks),
            engine.embed_token_arrays(toks), rtol=1e-5, atol=1e-6)

    def test_warmup_and_http(self, mesh_engine, rng):
        mesh_engine.warmup()
        app = ServeApp(mesh_engine, max_wait_ms=2.0)
        httpd = make_server(app, port=0)
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        try:
            with urllib.request.urlopen(base + "/healthz", timeout=10) as r:
                info = json.loads(r.read())
            assert info["mesh"] == {"data": 8, "model": 1}
            b64 = base64.b64encode(_jpeg_bytes(rng)).decode()
            req = urllib.request.Request(
                base + "/v1/embed/image",
                data=json.dumps({"images_b64": [b64]}).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=30) as r:
                out = json.loads(r.read())
            assert np.asarray(out["embeddings"]).shape == (1, 16)
        finally:
            httpd.shutdown()
            httpd.server_close()
            app.close()

    def test_non_pow2_data_axis_rejected(self, engine):
        import jax as j
        from jax.sharding import Mesh

        devs = np.asarray(j.devices()[:6]).reshape(6, 1)
        bad = Mesh(devs, ("data", "model"))
        from debias_vision_lang_tpu.serve.engine import InferenceEngine

        with pytest.raises(ValueError, match="power of two"):
            InferenceEngine(engine.model, engine.tokenizer, mesh=bad)


class TestInt8Serving:
    @pytest.mark.slow  # >8s on the 1-core gate host; full suite: -m ''
    def test_int8_engine(self, engine, rng):
        """compute_dtype='int8' wraps the vision tower in QuantizedCLIP;
        embeddings close to the fp engine (rank-stable contract)."""
        from debias_vision_lang_tpu.serve.engine import InferenceEngine

        e8 = InferenceEngine(engine.model, engine.tokenizer, max_batch=8,
                             compute_dtype="int8")
        assert e8.info()["precision"] == "int8"
        imgs = [rng.integers(0, 256, (N_PX, N_PX, 3), dtype=np.uint8)
                for _ in range(3)]
        out8 = e8.embed_image_arrays(imgs)
        ref = engine.embed_image_arrays(imgs)
        cos = np.sum(out8 * ref, -1) / (
            np.linalg.norm(out8, axis=-1) * np.linalg.norm(ref, axis=-1))
        assert cos.min() > 0.98  # tiny random tower, int8 rounding
        # text path delegates to the fp tower and score still works
        txt = e8.embed_token_arrays(list(e8.tokenize(["the", "the the"])))
        probs = e8.score(out8, txt)
        np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)

    def test_int8_text_engine(self, engine):
        """compute_dtype='int8-text' additionally quantizes the text tower;
        text embeddings stay close to fp and score normalizes."""
        from debias_vision_lang_tpu.serve.engine import InferenceEngine

        e8t = InferenceEngine(engine.model, engine.tokenizer, max_batch=8,
                              compute_dtype="int8-text")
        assert e8t.info()["precision"] == "int8-text"
        assert e8t.model.text_q is not None
        toks = list(e8t.tokenize(["the", "the the", "the the the"]))
        out = e8t.embed_token_arrays(toks)
        ref = engine.embed_token_arrays(toks)
        cos = np.sum(out * ref, -1) / (
            np.linalg.norm(out, axis=-1) * np.linalg.norm(ref, axis=-1))
        assert cos.min() > 0.98

    def test_int8_with_mesh(self, engine, rng):
        """int8 engine composes with DP mesh serving (QuantizedCLIP pytree
        replicates; batches shard)."""
        from debias_vision_lang_tpu.parallel.mesh import create_mesh
        from debias_vision_lang_tpu.serve.engine import InferenceEngine

        mesh = create_mesh((8, 1))
        e = InferenceEngine(engine.model, engine.tokenizer, max_batch=16,
                            compute_dtype="int8", mesh=mesh)
        imgs = [rng.integers(0, 256, (N_PX, N_PX, 3), dtype=np.uint8)
                for _ in range(11)]
        out = e.embed_image_arrays(imgs)
        single = InferenceEngine(engine.model, engine.tokenizer, max_batch=16,
                                 compute_dtype="int8").embed_image_arrays(imgs)
        np.testing.assert_allclose(out, single, rtol=1e-4, atol=1e-5)


class TestPatchStagingServing:
    """Serving now stages batches in the patch-contiguous uint8 layout on
    the bf16/int8 ladder rungs (same policy as eval/measure.py): the stem
    runs as one relayout-free folded matmul, no device preprocess."""

    def test_bf16_engine_stages_and_matches(self, engine, rng):
        from debias_vision_lang_tpu.serve.engine import InferenceEngine

        e = InferenceEngine(engine.model, engine.tokenizer, max_batch=8,
                            compute_dtype="bfloat16")
        assert e._patch == engine.cfg.vision.patch_size
        assert engine._patch is None  # fp32 keeps the reference-parity stem
        imgs = [rng.integers(0, 256, (N_PX, N_PX, 3), dtype=np.uint8)
                for _ in range(3)]
        out = e.embed_image_arrays(imgs)
        ref = engine.embed_image_arrays(imgs)
        cos = np.sum(out * ref, -1) / (
            np.linalg.norm(out, axis=-1) * np.linalg.norm(ref, axis=-1))
        assert cos.min() > 0.99
        e.warmup()  # staged-shape buckets compile

    def test_mesh_staging_matches_single(self, engine, rng):
        from debias_vision_lang_tpu.parallel.mesh import create_mesh
        from debias_vision_lang_tpu.serve.engine import InferenceEngine

        mesh = create_mesh((8, 1))
        e_mesh = InferenceEngine(engine.model, engine.tokenizer,
                                 max_batch=16, compute_dtype="bfloat16",
                                 mesh=mesh)
        e_one = InferenceEngine(engine.model, engine.tokenizer,
                                max_batch=16, compute_dtype="bfloat16")
        assert e_mesh._patch == e_one._patch == engine.cfg.vision.patch_size
        imgs = [rng.integers(0, 256, (N_PX, N_PX, 3), dtype=np.uint8)
                for _ in range(11)]
        np.testing.assert_allclose(e_mesh.embed_image_arrays(imgs),
                                   e_one.embed_image_arrays(imgs),
                                   rtol=1e-2, atol=1e-3)


class TestMalformedInputFuzz:
    """Hostile/garbage requests: every data endpoint must answer a clean
    4xx (never a 500/crash) and the server must stay serving."""

    @pytest.fixture(scope="class")
    def server(self, engine):
        app = ServeApp(engine, max_wait_ms=2.0)
        httpd = make_server(app, port=0)
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        yield base
        httpd.shutdown()
        httpd.server_close()
        app.close()

    def _post_raw(self, url, body, headers):
        req = urllib.request.Request(url, data=body, headers=headers)
        try:
            with urllib.request.urlopen(req, timeout=30) as resp:
                return resp.status
        except urllib.error.HTTPError as e:
            return e.code

    def test_garbage_payloads_all_4xx(self, server, rng):
        cases = [
            ("/v1/embed/image", b"\x00\xff" * 37,
             {"Content-Type": "application/json"}),
            ("/v1/embed/image", b'{"images_b64": "notalist"}',
             {"Content-Type": "application/json"}),
            ("/v1/embed/image", b'{"images_b64": [42]}',
             {"Content-Type": "application/json"}),
            ("/v1/embed/image", b'{"images_b64": ["%%%not-b64%%%"]}',
             {"Content-Type": "application/json"}),
            ("/v1/embed/text", b'{"texts": [null]}',
             {"Content-Type": "application/json"}),
            ("/v1/embed/text", b'[1, 2, 3]',
             {"Content-Type": "application/json"}),
            ("/v1/score", b'{"texts": ["a"]}',  # missing image_b64
             {"Content-Type": "application/json"}),
            ("/v1/embed/image-raw", b"\x00" * 7,  # not a frame multiple
             {"Content-Type": "application/octet-stream",
              "X-Image-Format": "u8"}),
            ("/v1/embed/image-raw", b"\xff\xff\xff\xff",  # absurd length
             {"Content-Type": "application/octet-stream",
              "X-Image-Format": "jpeg"}),
            ("/v1/embed/image-raw", b"x",  # unknown format header
             {"Content-Type": "application/octet-stream",
              "X-Image-Format": "tiff"}),
            ("/v1/nonexistent", b"{}",
             {"Content-Type": "application/json"}),
        ]
        for path, body, headers in cases:
            code = self._post_raw(server + path, body, headers)
            assert 400 <= code < 500, (path, body[:20], code)
        # random fuzz rounds on the JSON endpoints
        for _ in range(10):
            blob = rng.bytes(int(rng.integers(1, 300)))
            code = self._post_raw(server + "/v1/embed/image", blob,
                                  {"Content-Type": "application/json"})
            assert 400 <= code < 500, blob[:20]
        # server still healthy afterwards
        with urllib.request.urlopen(server + "/healthz", timeout=10) as r:
            assert r.status == 200


class TestReusePort:
    """SO_REUSEPORT scale-out: N server processes share ONE port with
    kernel connection balancing (the multi-worker mechanism — JAX owns
    chips exclusively, so workers are independent processes, not forks)."""

    def test_two_servers_one_port_both_serve(self, engine):
        import http.client
        import socket as _socket

        if not hasattr(_socket, "SO_REUSEPORT"):
            pytest.skip("platform lacks SO_REUSEPORT")
        # in-process stand-ins for two worker processes: the kernel
        # balances per-connection regardless of which process owns the
        # listening socket, so two listeners in one process exercise the
        # same kernel path
        apps = [ServeApp(engine, max_wait_ms=1.0) for _ in range(2)]
        # grab a free port (SO_REUSEPORT needs an explicit one); keep the
        # probe socket OPEN — also bound with SO_REUSEPORT — until the
        # servers have bound, so no other process can steal the port in
        # between (TOCTOU)
        probe = _socket.socket()
        probe.setsockopt(_socket.SOL_SOCKET, _socket.SO_REUSEPORT, 1)
        probe.bind(("127.0.0.1", 0))
        port = probe.getsockname()[1]
        try:
            servers = [make_server(a, port=port, reuse_port=True)
                       for a in apps]
        finally:
            probe.close()
        counts = [0, 0]

        def _count(s, i):
            orig = s.process_request

            def counted(request, client_address):
                counts[i] += 1
                return orig(request, client_address)

            s.process_request = counted

        threads = []
        try:
            for i, s in enumerate(servers):
                _count(s, i)
                t = threading.Thread(target=s.serve_forever, daemon=True)
                t.start()
                threads.append(t)
            for _ in range(40):  # fresh connection each → kernel rebalances
                conn = http.client.HTTPConnection("127.0.0.1", port,
                                                  timeout=30)
                try:
                    conn.request("GET", "/healthz")
                    resp = conn.getresponse()
                    assert resp.status == 200
                    resp.read()
                finally:
                    conn.close()
            assert sum(counts) == 40
            # 4-tuple hashing over 40 distinct source ports: P(one listener
            # gets everything) ≈ 2^-39 — both must have served
            assert counts[0] > 0 and counts[1] > 0, counts
        finally:
            for s in servers:
                s.shutdown()
                s.server_close()
            for a in apps:
                a.close()

    def test_reuse_port_requires_explicit_port(self, engine):
        app = ServeApp(engine, max_wait_ms=1.0)
        try:
            with pytest.raises(ValueError, match="explicit port"):
                make_server(app, port=0, reuse_port=True)
        finally:
            app.close()

    def test_plain_bind_still_exclusive(self, engine):
        """Without reuse_port a second bind on the port must fail — the
        flag is opt-in, not a global behavior change."""
        app = ServeApp(engine, max_wait_ms=1.0)
        try:
            s1 = make_server(app, port=0)
            port = s1.server_address[1]
            with pytest.raises(OSError):
                make_server(app, port=port)
            s1.server_close()
        finally:
            app.close()


class TestAuthTLS:
    """Serving hardening: bearer-token auth and direct-TLS termination."""

    @pytest.fixture(scope="class")
    def auth_server(self, engine):
        app = ServeApp(engine, max_wait_ms=2.0)
        httpd = make_server(app, port=0, auth_token="sekrit-42")
        thread = threading.Thread(target=httpd.serve_forever, daemon=True)
        thread.start()
        yield f"http://127.0.0.1:{httpd.server_address[1]}"
        httpd.shutdown()
        httpd.server_close()
        app.close()

    def _post(self, url, payload, token=None):
        headers = {"Content-Type": "application/json"}
        if token is not None:
            headers["Authorization"] = f"Bearer {token}"
        req = urllib.request.Request(
            url, data=json.dumps(payload).encode(), headers=headers)
        try:
            with urllib.request.urlopen(req, timeout=30) as resp:
                return resp.status, json.loads(resp.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    def test_data_endpoints_require_token(self, auth_server):
        code, out = self._post(auth_server + "/v1/embed/text",
                               {"texts": ["the"]})
        assert code == 401 and "token" in out["error"]
        code, _ = self._post(auth_server + "/v1/embed/text",
                             {"texts": ["the"]}, token="wrong")
        assert code == 401

    def test_correct_token_accepted(self, auth_server):
        code, out = self._post(auth_server + "/v1/embed/text",
                               {"texts": ["the"]}, token="sekrit-42")
        assert code == 200
        assert np.isfinite(np.asarray(out["embeddings"])).all()

    def test_healthz_stays_open(self, auth_server):
        with urllib.request.urlopen(auth_server + "/healthz",
                                    timeout=10) as resp:
            assert resp.status == 200

    def test_healthz_minimal_without_token(self, auth_server):
        """Unauthenticated probes get liveness ONLY: model name, mesh
        topology, HBM usage and traffic stats stay behind the token."""
        with urllib.request.urlopen(auth_server + "/healthz",
                                    timeout=10) as resp:
            info = json.loads(resp.read())
        assert info == {"status": "ok"}
        req = urllib.request.Request(
            auth_server + "/healthz",
            headers={"Authorization": "Bearer sekrit-42"})
        with urllib.request.urlopen(req, timeout=10) as resp:
            full = json.loads(resp.read())
        assert "model" in full and "image_batches" in full

    def test_env_token_default(self, engine, monkeypatch):
        monkeypatch.setenv("DVL_SERVE_TOKEN", "env-tok")
        app = ServeApp(engine, max_wait_ms=2.0)
        httpd = make_server(app, port=0)
        thread = threading.Thread(target=httpd.serve_forever, daemon=True)
        thread.start()
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        try:
            code, _ = self._post(base + "/v1/embed/text", {"texts": ["the"]})
            assert code == 401
            code, _ = self._post(base + "/v1/embed/text", {"texts": ["the"]},
                                 token="env-tok")
            assert code == 200
        finally:
            httpd.shutdown()
            httpd.server_close()
            app.close()

    def test_tls_termination(self, engine, tmp_path):
        import ssl
        import subprocess

        cert = tmp_path / "cert.pem"
        try:
            subprocess.run(
                ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-keyout",
                 str(cert), "-out", str(cert), "-days", "1", "-nodes",
                 "-subj", "/CN=localhost"],
                check=True, capture_output=True, timeout=60)
        except (FileNotFoundError, subprocess.CalledProcessError):
            pytest.skip("openssl unavailable")
        app = ServeApp(engine, max_wait_ms=2.0)
        httpd = make_server(app, port=0, tls_cert=str(cert))
        thread = threading.Thread(target=httpd.serve_forever, daemon=True)
        thread.start()
        base = f"https://127.0.0.1:{httpd.server_address[1]}"
        ctx = ssl.create_default_context()
        ctx.check_hostname = False
        ctx.verify_mode = ssl.CERT_NONE
        try:
            req = urllib.request.Request(
                base + "/v1/embed/text",
                data=json.dumps({"texts": ["the"]}).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=30, context=ctx) as resp:
                assert resp.status == 200
                out = json.loads(resp.read())
            assert np.isfinite(np.asarray(out["embeddings"])).all()
        finally:
            httpd.shutdown()
            httpd.server_close()
            app.close()

    def test_non_ascii_bearer_401_not_crash(self, auth_server):
        # compare_digest would TypeError on non-ASCII str operands; the
        # handler must 401 cleanly instead of aborting the connection
        req = urllib.request.Request(
            auth_server + "/v1/embed/text",
            data=json.dumps({"texts": ["the"]}).encode(),
            headers={"Content-Type": "application/json",
                     "Authorization": "Bearer caf\xe9"})
        try:
            with urllib.request.urlopen(req, timeout=30) as resp:
                code = resp.status
        except urllib.error.HTTPError as e:
            code = e.code
        assert code == 401
        # server still alive
        with urllib.request.urlopen(auth_server + "/healthz",
                                    timeout=10) as resp:
            assert resp.status == 200


class TestCancelledFuture:
    def test_cancelled_future_does_not_kill_worker(self):
        """A consumer cancel() on a pending future must not raise
        InvalidStateError in the worker thread (which would hang every
        subsequent request)."""
        import threading
        import time as _time

        from debias_vision_lang_tpu.serve.batcher import MicroBatcher

        gate = threading.Event()

        def run_batch(items):
            gate.wait(timeout=5)
            return [x * 2 for x in items]

        b = MicroBatcher(run_batch, max_batch=4, max_wait_ms=1.0)
        try:
            f1 = b.submit(1)  # opens the window; run_batch blocks on gate
            _time.sleep(0.05)
            f2 = b.submit(2)
            assert f2.cancel()  # still queued → cancellable
            gate.set()
            assert f1.result(timeout=5) == 2
            # worker must still be alive and serving
            f3 = b.submit(3)
            assert f3.result(timeout=5) == 6
        finally:
            gate.set()
            b.close()
