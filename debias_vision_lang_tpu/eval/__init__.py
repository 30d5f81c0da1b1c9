from .measure import (
    eval_ranking,
    gen_prompts,
    get_labels_img_embeddings,
    get_prompt_embeddings,
    measure_bias,
)
