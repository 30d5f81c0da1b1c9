from .measure import (
    eval_ranking,
    gen_prompts,
    get_labels_img_embeddings,
    get_prompt_embeddings,
    measure_bias,
)
from .zero_shot import build_zero_shot_classifier, classify, zero_shot_accuracy
