from .preprocess import (
    CLIP_MEAN,
    CLIP_STD,
    Preprocess,
    build_preprocess,
    preprocess_batch,
    resize_bicubic,
    resize_weights,
    to_rgb_array,
)
