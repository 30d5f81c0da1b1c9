from . import clip, convert, layers
from .adversary import Adversary, apply as adversary_apply, init_adversary_params
from .debias import DebiasCLIP, init_debias_tokens, inject_prompts, trainable_mask
from .loader import CLIP, ClipLike, model_loader
