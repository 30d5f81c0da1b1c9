"""Path constants (reference: debias_clip/__init__.py:21-23).

The reference resolves a ``data/`` directory shipped next to the package and
derives the FairFace root and prompt-template CSV from it.  We keep the same
names, add override via environment variables, and a user cache dir for
downloaded checkpoints/vocab (reference: debias_clip/model/clip.py:73
``~/.cache/debias_clip``).
"""

from __future__ import annotations

import os
import pathlib

# repo-root/assets is the packaged data dir (prompt templates, tokenizer vocab).
DATA_PATH = pathlib.Path(
    os.environ.get(
        "DEBIAS_VLT_DATA_PATH",
        str((pathlib.Path(__file__) / ".." / ".." / ".." / "assets").resolve()),
    )
).resolve()

FAIRFACE_DATA_PATH = pathlib.Path(
    os.environ.get("DEBIAS_VLT_FAIRFACE_PATH", str(DATA_PATH / "fairface"))
)

UTKFACE_DATA_PATH = pathlib.Path(
    os.environ.get("DEBIAS_VLT_UTKFACE_PATH", str(DATA_PATH / "utkface"))
)

PROMPT_DATA_PATH = DATA_PATH / "prompt_templates.csv"

BPE_VOCAB_PATH = pathlib.Path(
    os.environ.get("DEBIAS_VLT_BPE_PATH", str(DATA_PATH / "bpe_simple_vocab_16e6.txt.gz"))
)

CACHE_PATH = pathlib.Path(
    os.environ.get(
        "DEBIAS_VLT_CACHE_PATH", os.path.expanduser("~/.cache/debias_vision_lang_tpu")
    )
)
