"""Video ingest for the Frozen-in-Time family (BASELINE config #5:
"multi-frame ingest bias measurement + debias fine-tune").

Videos are frame directories (``<root>/<video_id>/frame_*.jpg``) or animated
GIFs — formats PIL decodes without external codecs.  A labels CSV
(``file,gender,race,age``, same label vocabulary as FairFace) makes any such
corpus measurable with ``measure_bias`` by passing a ``VideoDataset`` through
the same ``HostLoader`` (batches become [B, T, H, W, 3]; the fused device
preprocess maps over frames).
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Union

import numpy as np
import pandas as pd

from .datasets import IATDataset


def load_frames(path: str, num_frames: int) -> np.ndarray:
    """Uniformly sample ``num_frames`` from a frame-dir or GIF → [T, H, W, 3]."""
    from PIL import Image

    if os.path.isdir(path):
        # natural-number sort: unpadded frame numbers (frame_2 vs frame_10,
        # common ffmpeg %d output) scramble temporal order under plain
        # lexicographic sorting
        import re

        def frame_key(name: str):
            return [int(t) if t.isdigit() else t
                    for t in re.split(r"(\d+)", name)]

        files = sorted(
            (f for f in os.listdir(path)
             if f.lower().endswith((".jpg", ".jpeg", ".png"))),
            key=frame_key,
        )
        if not files:
            raise FileNotFoundError(f"no frames in {path}")
        idx = np.linspace(0, len(files) - 1, num_frames).astype(int)
        frames = []
        for i in idx:
            with Image.open(os.path.join(path, files[i])) as im:
                frames.append(np.asarray(im.convert("RGB")))
        return np.stack(frames)
    # animated image (GIF/WebP)
    with Image.open(path) as im:
        n = getattr(im, "n_frames", 1)
        idx = np.linspace(0, n - 1, num_frames).astype(int)
        frames = []
        for i in idx:
            im.seek(int(i))
            frames.append(np.asarray(im.convert("RGB")))
        return np.stack(frames)


class VideoDataset(IATDataset):
    """Attribute-labeled videos; same label encodings as FairFace."""

    RACE_ENCODING = {
        "White": 0, "Southeast Asian": 1, "Middle Eastern": 2, "Black": 3,
        "Indian": 4, "Latino_Hispanic": 5, "East Asian": 6,
    }

    def __init__(
        self,
        data_path: os.PathLike,
        iat_type: Optional[str] = None,
        csv_name: str = "labels.csv",
        num_frames: int = 4,
        _n_samples: Union[int, float, None] = None,
        transforms: Optional[Callable] = None,
        equal_split: bool = False,
    ):
        self.data_path = str(data_path)
        self.num_frames = num_frames
        self._transforms = (lambda x: x) if transforms is None else transforms
        self.labels = pd.read_csv(os.path.join(self.data_path, csv_name),
                                  keep_default_na=False)
        self.labels.sort_values("file", inplace=True)
        # shared seeded subsample/balance (float fractions included);
        # balancing only applies when the CSV carries a gender column
        self._subsample_and_balance(
            _n_samples, equal_split and "gender" in self.labels.columns)
        self._paths = [os.path.join(self.data_path, f)
                       for f in self.labels["file"]]
        self.iat_type = iat_type
        self.iat_labels, self.n_iat_classes = self.gen_labels(iat_type)

    def load_image(self, index: int) -> np.ndarray:
        """Loader interface: one sample = [T, H, W, 3] uint8 frames."""
        return self._transforms(load_frames(self._paths[index], self.num_frames))

    load_video = load_image
