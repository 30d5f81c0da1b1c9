"""Serving throughput under concurrent single-image clients.

Exercises the full serving stack — HTTP parse, base64, native decode,
bit-exact resize/crop, micro-batch coalescing, bucketed device launch —
with N threads each posting single-image requests in a closed loop, the
worst case for a batching server (every image rides one request).

Three phases:
  1. JSON/base64 single-image clients (the original worst case)
  2. RAW single-image clients (/v1/embed/image-raw, u8 frames + raw f32
     response — no JSON or base64 anywhere)
  3. RAW batch clients (64 frames per request) — the encoding-free
     batch path's ceiling

Usage: python benchmarks/serve_load.py [clients] [seconds] [arch]
"""

import base64
import io
import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    clients = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 20.0
    arch = sys.argv[3] if len(sys.argv) > 3 else "openai/CLIP/ViT-B/32"

    from PIL import Image

    from debias_vision_lang_tpu.core.cache import enable_compilation_cache
    from debias_vision_lang_tpu.models.loader import model_loader
    from debias_vision_lang_tpu.serve import InferenceEngine, ServeApp, make_server

    enable_compilation_cache()
    model, _, tokenizer, _ = model_loader(arch, pretrained=False)
    engine = InferenceEngine(model, tokenizer, max_batch=64)
    t0 = time.perf_counter()
    engine.warmup(log=lambda m: print(m, flush=True))
    print(f"warmup (all image+text buckets): {time.perf_counter() - t0:.1f}s")
    app = ServeApp(engine, max_wait_ms=5.0)
    httpd = make_server(app, port=0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}/v1/embed/image"

    rng = np.random.default_rng(0)
    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 256, (317, 211, 3), dtype=np.uint8)).save(
        buf, format="JPEG", quality=90)
    payload = json.dumps(
        {"images_b64": [base64.b64encode(buf.getvalue()).decode()]}).encode()

    raw_url = f"http://127.0.0.1:{httpd.server_address[1]}/v1/embed/image-raw"
    n_px = engine.info()["n_px"]
    frame = rng.integers(0, 256, (n_px, n_px, 3), dtype=np.uint8).tobytes()
    raw_batch = frame * 64
    jb = buf.getvalue()
    jpeg_batch = (len(jb).to_bytes(4, "big") + jb) * 64

    def post_json():
        req = urllib.request.Request(
            url, data=payload, headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=600) as r:
            json.loads(r.read())
        return 1

    def post_raw():
        req = urllib.request.Request(
            raw_url, data=frame,
            headers={"Content-Type": "application/octet-stream",
                     "X-Image-Format": "u8"})
        with urllib.request.urlopen(req, timeout=600) as r:
            r.read()
        return 1

    def post_raw_batch():
        req = urllib.request.Request(
            raw_url, data=raw_batch,
            headers={"Content-Type": "application/octet-stream",
                     "X-Image-Format": "u8"})
        with urllib.request.urlopen(req, timeout=600) as r:
            r.read()
        return 64

    def post_jpeg_batch():
        # 64 length-prefixed 317x211 JPEG records: decode + PIL-exact
        # resize + crop (+ patch staging on bf16/int8) run as ONE threaded
        # native-ingest call server-side (engine.prepare_images_batch)
        req = urllib.request.Request(
            raw_url, data=jpeg_batch,
            headers={"Content-Type": "application/octet-stream",
                     "X-Image-Format": "jpeg"})
        with urllib.request.urlopen(req, timeout=600) as r:
            r.read()
        return 64

    def run_phase(name, post, n_clients):
        post()  # warm
        counts = [0] * n_clients
        stop = threading.Event()

        def client(i):
            while not stop.is_set():
                counts[i] += post()

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(n_clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        time.sleep(seconds)
        stop.set()
        for t in threads:
            t.join()
        dt = time.perf_counter() - t0
        total = sum(counts)
        print(f"{name}: {n_clients} clients, {total} imgs in {dt:.1f}s = "
              f"{total / dt:.1f} img/s end-to-end", flush=True)
        return total / dt

    info = engine.info()
    print(f"{arch} (backend={info['backend']}, dtype={info['compute_dtype']})")
    r_json = run_phase("json/base64 single", post_json, clients)
    r_raw = run_phase("raw u8 single     ", post_raw, clients)
    r_rawb = run_phase("raw u8 batch-64   ", post_raw_batch, max(2, clients // 4))
    r_jpgb = run_phase("raw jpeg batch-64 ", post_jpeg_batch,
                       max(2, clients // 4))
    print(f"raw single vs json: {r_raw / r_json:.2f}x ; "
          f"raw batch-64 vs json: {r_rawb / r_json:.2f}x ; "
          f"jpeg batch-64 vs json: {r_jpgb / r_json:.2f}x")
    print("batcher:", app._images.stats)
    httpd.shutdown()
    httpd.server_close()
    app.close()


if __name__ == "__main__":
    main()
