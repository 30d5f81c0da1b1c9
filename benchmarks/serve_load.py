"""Serving throughput under concurrent single-image clients.

Exercises the full serving stack — HTTP parse, base64, native decode,
bit-exact resize/crop, micro-batch coalescing, bucketed device launch —
with N threads each posting single-image requests in a closed loop, the
worst case for a batching server (every image rides one request).

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

    def post():
        req = urllib.request.Request(
            url, data=payload, headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            json.loads(r.read())

    post()  # warm: compiles bucket 1
    counts = [0] * clients
    stop = threading.Event()

    def client(i):
        while not stop.is_set():
            post()
            counts[i] += 1

    threads = [threading.Thread(target=client, args=(i,)) for i in range(clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    time.sleep(seconds)
    stop.set()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    total = sum(counts)
    print(f"{arch}: {clients} clients, {total} reqs in {dt:.1f}s = "
          f"{total / dt:.1f} img/s end-to-end "
          f"(backend={engine.info()['backend']}, "
          f"dtype={engine.info()['compute_dtype']})")
    print("batcher:", app._images.stats)
    httpd.shutdown()
    httpd.server_close()
    app.close()


if __name__ == "__main__":
    main()
