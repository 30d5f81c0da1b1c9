"""Batched inference serving (beyond the reference: production front-end).

The reference is a library + scripts; deploying its models means writing
your own server.  This package provides one, built TPU-first: micro-batched
device launches at power-of-two bucket shapes, the native ingest runtime on
the decode path, and the whole model passed as a jit argument.
"""

from .batcher import MicroBatcher
from .engine import InferenceEngine, decode_image_bytes
from .server import ServeApp, make_server, serve_forever

__all__ = [
    "MicroBatcher",
    "InferenceEngine",
    "decode_image_bytes",
    "ServeApp",
    "make_server",
    "serve_forever",
]
