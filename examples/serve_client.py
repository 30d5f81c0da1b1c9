"""Client for the batched inference server (`cli serve`).

Start a server (random weights work offline):

    python -m debias_vision_lang_tpu.cli serve --random-weights --port 8000

then:

    python examples/serve_client.py http://127.0.0.1:8000 IMAGE.jpg \
        "a photo of a smart person" "a photo of a dumb person"

Stdlib-only (urllib) — shows the three endpoints and reads the
batch-formation stats the server exports on /healthz.
"""

import base64
import json
import sys
import urllib.request


def post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as resp:
        return json.loads(resp.read())


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    base, image_path, texts = sys.argv[1], sys.argv[2], sys.argv[3:]
    texts = texts or ["a photo of a smart person", "a photo of a dumb person"]

    with urllib.request.urlopen(base + "/healthz", timeout=30) as resp:
        info = json.loads(resp.read())
    print(f"server: {info['model']} on {info['backend']} "
          f"({info['precision']}, max_batch {info['max_batch']})")

    with open(image_path, "rb") as f:
        b64 = base64.b64encode(f.read()).decode()

    emb = post(base + "/v1/embed/image", {"images_b64": [b64]})
    print(f"image embedding: dim {len(emb['embeddings'][0])}")

    if info["has_tokenizer"]:
        out = post(base + "/v1/score", {"image_b64": b64, "texts": texts})
        for text, p in zip(texts, out["probs"]):
            print(f"  {p:6.4f}  {text}")
    else:
        print("(no tokenizer on the server — BPE vocab not fetched — "
              "text endpoints unavailable)")

    with urllib.request.urlopen(base + "/healthz", timeout=30) as resp:
        stats = json.loads(resp.read())["image_batches"]
    print(f"server image batches so far: {stats}")


if __name__ == "__main__":
    main()
