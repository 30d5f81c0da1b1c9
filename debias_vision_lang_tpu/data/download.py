"""Gated asset fetchers: FairFace, UTKFace, BPE vocab, prompt checkpoints.

Reference behaviors being replaced:
  * FairFace Google-Drive fetch via gdown + ``unzip`` subprocess
    (reference: debias_clip/datasets.py:89-117) → stdlib urllib with the
    Drive confirm-token dance, python ``zipfile``, retries, and sha256
    verification WHEN a digest is pinned in ``KNOWN_SHA256``.
  * Checkpoint fetch with a *global SSL-verification bypass*
    (reference: debias_clip/model/clip.py:9-10,22-42) → normal verified TLS.
  * UTKFace has no reference downloader (README.md:111 links the GitHub
    page only) — ``ensure_utkface`` adds one for the aligned+cropped drive
    archive.

Integrity: ``KNOWN_SHA256`` maps asset filenames to digests; entries are
pinned as assets are first fetched on a networked machine (this build
environment is offline, so the table starts empty — fetch() still verifies
size/completeness and any digest passed explicitly).

All fetchers are no-ops when the target exists, and raise a clear
RuntimeError naming the asset when the machine has no network.

Usage:  python -m debias_vision_lang_tpu.data.download {bpe,fairface,utkface,all}
"""

from __future__ import annotations

import hashlib
import os
import pathlib
import re
import shutil
import sys
import time
import urllib.parse
import urllib.request
import zipfile
from typing import Optional

from ..core.paths import BPE_VOCAB_PATH, CACHE_PATH

# Same source assets as the reference (datasets.py:92-100, model/clip.py:14-20)
FAIRFACE_PARTS = {
    ("imgs", "train_val"): (
        "https://drive.google.com/uc?id=1g7qNOZz9wC7OfOhcPqH1EZ5bk1UFGmlL",
        "train_val_imgs.zip",
    ),
    ("labels", "train"): (
        "https://drive.google.com/uc?id=1i1L3Yqwaio7YSOCj7ftgk8ZZchPG7dmH",
        "train_labels.csv",
    ),
    ("labels", "val"): (
        "https://drive.google.com/uc?id=1wOdja-ezstMEp81tX1a-EYkFebev4h7D",
        "val_labels.csv",
    ),
}

BPE_VOCAB_URL = (
    "https://github.com/openai/CLIP/raw/main/clip/bpe_simple_vocab_16e6.txt.gz"
)

PRETRAINED_PROMPTS = {
    "ViT-B/16-gender": {
        # https (the reference fetches this over plain http, clip.py:16-19)
        "url": "https://www.robots.ox.ac.uk/~maxbain/oxai-bias/"
        "best_ndkl_oai-clip-vit-b-16_neptune_run_OXVLB-317_model_e4_step_5334_embeddings.pt",
        "clip_arch": "ViT-B/16",
        "num_debias_tokens": 2,
    }
}

# UTKFace "Aligned & Cropped Faces" (the variant the reference README names;
# labels ride in the filenames [age]_[gender]_[race]_[date].jpg)
UTKFACE_DRIVE_ID = "0BxYys69jI14kYVM3aVhKS1VhRUk"

# filename → sha256.  Pinned on first fetch from a networked machine; an
# entry here makes every later fetch of that asset verify integrity.
KNOWN_SHA256: dict = {}


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def fetch(
    url: str,
    dest: str,
    sha256: Optional[str] = None,
    retries: int = 3,
    progress: bool = True,
) -> str:
    """Stream-download with retry + optional checksum. Returns dest path.

    When no explicit digest is given, falls back to ``KNOWN_SHA256`` keyed
    by the destination filename."""
    dest = str(dest)
    if sha256 is None:
        sha256 = KNOWN_SHA256.get(os.path.basename(dest))
    if os.path.exists(dest):
        if sha256 is None or _sha256(dest) == sha256:
            return dest
        os.remove(dest)  # corrupt partial — refetch
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    tmp = dest + ".part"
    last_err = None
    for attempt in range(retries):
        try:
            req = urllib.request.Request(url, headers={"User-Agent": "debias-vlt/1.0"})
            with urllib.request.urlopen(req, timeout=60) as src, open(tmp, "wb") as out:
                total = int(src.headers.get("Content-Length") or 0)
                done = 0
                while True:
                    buf = src.read(1 << 16)
                    if not buf:
                        break
                    out.write(buf)
                    done += len(buf)
                    if progress and total:
                        pct = 100 * done // total
                        print(f"\r  {os.path.basename(dest)}: {pct}%", end="",
                              file=sys.stderr)
            if progress:
                print(file=sys.stderr)
            if sha256 is not None and _sha256(tmp) != sha256:
                raise IOError(f"checksum mismatch for {url}")
            os.replace(tmp, dest)
            return dest
        except Exception as e:  # noqa: BLE001 — retried, then re-raised
            last_err = e
            if attempt + 1 < retries:  # no pointless backoff after the last try
                time.sleep(2 ** attempt)
    raise RuntimeError(
        f"Could not download {url} after {retries} attempts "
        f"({_failure_hint(last_err, dest)}): {last_err}"
    )


def _failure_hint(err, dest: str) -> str:
    """Point the user at the actual failure class: integrity errors are not
    connectivity errors."""
    if "checksum" in str(err):
        return "checksum mismatch — corrupt source or stale KNOWN_SHA256 pin"
    return f"offline environment? fetch the asset manually to {dest}"


def _looks_like_html(path: str) -> bool:
    with open(path, "rb") as f:
        start = f.read(512).lstrip().lower()
    return start.startswith(b"<!doctype html") or start.startswith(b"<html")


def fetch_gdrive(file_url: str, dest: str, retries: int = 3) -> str:
    """Google Drive download handling the large-file confirm interstitial.

    The directly-served branch gets the same guarantees as ``fetch()``:
    existing-dest short-circuit, retry with backoff, and the pinned
    ``KNOWN_SHA256`` digest check — a dropped stream or corrupt payload
    must never be committed to ``dest``."""
    m = re.search(r"id=([\w-]+)", file_url)
    if not m:
        raise ValueError(f"not a drive uc url: {file_url}")
    file_id = m.group(1)
    dest = str(dest)
    sha256 = KNOWN_SHA256.get(os.path.basename(dest))
    if os.path.exists(dest):
        if sha256 is None or _sha256(dest) == sha256:
            return dest
        os.remove(dest)  # corrupt partial — refetch
    url = f"https://drive.google.com/uc?export=download&id={file_id}"
    head = None
    last_err = None
    for attempt in range(retries):
        try:
            req = urllib.request.Request(url,
                                         headers={"User-Agent": "debias-vlt/1.0"})
            with urllib.request.urlopen(req, timeout=60) as resp:
                head = resp.read(1 << 20)
                ctype = resp.headers.get("Content-Type", "")
                if "text/html" in ctype:
                    break  # confirm interstitial: handled below via fetch()
                # directly-served asset: stream the already-open response
                # instead of discarding the first MB and re-requesting
                os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
                tmp = dest + ".part"
                with open(tmp, "wb") as out:
                    out.write(head)
                    shutil.copyfileobj(resp, out)
                if sha256 is not None and _sha256(tmp) != sha256:
                    os.remove(tmp)
                    raise IOError(
                        f"checksum mismatch for drive id={file_id}")
                os.replace(tmp, dest)
                return dest
        except Exception as e:  # noqa: BLE001 — retried, then re-raised
            last_err = e
            if attempt + 1 < retries:  # no pointless backoff after the last try
                time.sleep(2 ** attempt)
    else:
        raise RuntimeError(
            f"Could not download drive id={file_id} after {retries} attempts "
            f"({_failure_hint(last_err, dest)}): {last_err}")
    # interstitial virus-scan/confirm page: collect the hidden form fields
    # (modern markup carries confirm + uuid as <input name=.. value=..>)
    fields = dict(re.findall(rb'name="([\w-]+)"[^>]*value="([^"]*)"', head))
    params = {"id": file_id, "export": "download",
              "confirm": fields.get(b"confirm", b"t").decode()}
    if b"uuid" in fields:
        params["uuid"] = fields[b"uuid"].decode()
    url = ("https://drive.usercontent.google.com/download?"
           + urllib.parse.urlencode(params))
    out_path = fetch(url, dest)
    if _looks_like_html(out_path):
        os.remove(out_path)
        raise IOError(
            f"Google Drive returned an HTML page instead of the file for "
            f"id={file_id} (quota exceeded / permission / changed "
            "interstitial?) — fetch the asset manually")
    return out_path


def ensure_fairface(root: str) -> None:
    """Idempotent FairFace layout under ``root``:
    imgs/train_val/*.jpg, labels/{train,val}/{mode}_labels.csv."""
    root = str(root)
    for (part, sub), (url, fname) in FAIRFACE_PARTS.items():
        sub_dir = os.path.join(root, part, sub)
        if os.path.isdir(sub_dir):
            continue
        os.makedirs(sub_dir, exist_ok=True)
        out_path = os.path.join(sub_dir, fname)
        print(f"Fetching FairFace {part}/{sub}...", file=sys.stderr)
        try:
            fetch_gdrive(url, out_path)
            if fname.endswith(".zip"):
                with zipfile.ZipFile(out_path) as zf:
                    zf.extractall(sub_dir)
                os.remove(out_path)
        except Exception as e:
            # cleanup covers extraction too: a truncated zip must not leave
            # sub_dir behind — idempotency is directory-existence based, so
            # a surviving partial dir would be silently skipped forever
            shutil.rmtree(sub_dir, ignore_errors=True)
            raise RuntimeError(
                f"FairFace {part}/{sub} is not present under {root} and "
                f"could not be downloaded ({type(e).__name__}: {e}). On a "
                "networked machine run `python -m debias_vision_lang_tpu.cli "
                "download fairface`, or point --data-path / "
                "$DEBIAS_VLT_FAIRFACE_PATH at an existing copy.") from e


def ensure_utkface(root: str) -> None:
    """Idempotent UTKFace (aligned & cropped) layout: ``root/*.jpg`` with
    labels encoded in the filenames.  Mirrors ``ensure_fairface``; the
    archive is a Drive-hosted tar.gz (UTKFace.tar.gz with a UTKFace/
    top-level dir — flattened into ``root``)."""
    import tarfile

    root = str(root)
    if os.path.isdir(root) and any(
            f.lower().endswith((".jpg", ".jpeg", ".png"))
            for f in os.listdir(root)):
        return  # already populated
    os.makedirs(root, exist_ok=True)
    archive = os.path.join(root, "UTKFace.tar.gz")
    print("Fetching UTKFace (aligned & cropped)...", file=sys.stderr)
    try:
        fetch_gdrive(f"https://drive.google.com/uc?id={UTKFACE_DRIVE_ID}",
                     archive)
    except Exception as e:
        raise RuntimeError(
            f"UTKFace is not present under {root} and could not be "
            f"downloaded ({type(e).__name__}: {e}). On a networked machine "
            "run `python -m debias_vision_lang_tpu.cli download utkface`, "
            "or point --data-path / $DEBIAS_VLT_UTKFACE_PATH at an existing "
            "copy.") from e
    # stage into a temp dir first: idempotency is any-jpg-present, so a
    # partial extraction straight into root would mask the broken state
    staging = os.path.join(root, ".utk_partial")
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(staging)
    try:
        with tarfile.open(archive) as tf:
            for member in tf.getmembers():
                if not member.isfile():
                    continue
                name = os.path.basename(member.name)
                if not name.lower().endswith((".jpg", ".jpeg", ".png")):
                    continue
                with tf.extractfile(member) as src, \
                        open(os.path.join(staging, name), "wb") as out:
                    shutil.copyfileobj(src, out)
        for name in os.listdir(staging):
            os.replace(os.path.join(staging, name), os.path.join(root, name))
    except Exception:
        shutil.rmtree(staging, ignore_errors=True)
        os.remove(archive)  # refetch next time rather than re-reading a bad tar
        raise
    shutil.rmtree(staging, ignore_errors=True)
    os.remove(archive)


def fetch_bpe_vocab(dest: Optional[os.PathLike] = None) -> str:
    """Fetch the CLIP merges file to the packaged assets path."""
    return fetch(BPE_VOCAB_URL, str(dest or BPE_VOCAB_PATH))


def fetch_pretrained_prompts(name: str, root: Optional[os.PathLike] = None) -> str:
    """Fetch a pretrained prompt-embedding checkpoint (hub assets,
    reference: model/clip.py:49-73)."""
    if name not in PRETRAINED_PROMPTS:
        raise KeyError(f"{name} not in {sorted(PRETRAINED_PROMPTS)}")
    url = PRETRAINED_PROMPTS[name]["url"]
    dest = pathlib.Path(root or CACHE_PATH) / os.path.basename(url)
    return fetch(url, str(dest))


KNOWN_TARGETS = ("all", "bpe", "fairface", "utkface")


def main(argv=None):
    args = list(sys.argv[1:] if argv is None else argv) or ["all"]
    unknown = [a for a in args if a not in KNOWN_TARGETS]
    if unknown:
        raise SystemExit(
            f"unknown download target(s) {unknown}; known: "
            f"{list(KNOWN_TARGETS)}")
    if "bpe" in args or "all" in args:
        fetch_bpe_vocab()
    if "fairface" in args or "all" in args:
        from ..core.paths import FAIRFACE_DATA_PATH

        ensure_fairface(str(FAIRFACE_DATA_PATH))
    if "utkface" in args or "all" in args:
        from ..core.paths import UTKFACE_DATA_PATH

        ensure_utkface(str(UTKFACE_DATA_PATH))


if __name__ == "__main__":
    main()
