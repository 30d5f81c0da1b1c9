from .adversarial import (
    AdversarialTrainer,
    build_train_steps,
    clip_contrastive_loss,
    make_optimizer,
    sigmoid_bce,
    similarity_scores,
)
from .state import export_reference_pt, restore_checkpoint, save_checkpoint
