from .datasets import FairFace, IATDataset, UTKFace
from .loader import Batch, HostLoader, shard_batch
from .pairs import ImageCaptionPairs
from .video import VideoDataset, load_frames
