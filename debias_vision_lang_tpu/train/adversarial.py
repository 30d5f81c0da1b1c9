"""Adversarial prompt-array debias training.

The reference repo ships only the building blocks — the Adversary MLP
(debias_clip/model/model.py:337-361), the freezing machinery (:291-334) and a
README protocol description (README.md:148-157); the loop itself is not in
the tree (SURVEY.md §3.5 reconstructs it, with the shipped checkpoint's
filename — best_ndkl…e4_step_5334 — as evidence for epochs/selection).  This
module is that loop, TPU-first:

  * both encoders frozen (the default ``n_train_*_layers=0`` /
    ``freeze_proj=True``), only the prompt array — and optionally top
    resblocks via gradient masks — trains;
  * the adversary reads the cosine-similarity vector between each image and
    the sensitive-prompt set and predicts the protected attribute
    (README.md:152-154); it minimizes sigmoid-BCE on that prediction while
    the prompt tokens are updated to MAXIMIZE it, jointly with a CLIP
    contrastive loss on an image–caption batch that prevents feature
    degradation (README.md:155-157);
  * both updates are single jitted steps with donated optimizer state;
    image embeddings come from one frozen jitted tower pass per batch;
  * model selection by best NDKL on periodic eval, matching the shipped
    checkpoint's ``best_ndkl`` provenance (model/clip.py:16).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.config import AdversaryConfig, CLIPConfig, DebiasConfig, TrainConfig
from ..models import adversary as adversary_model
from ..models import clip as clip_model
from ..models import debias as debias_model
from ..models.layers import Params


def sigmoid_bce(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Numerically stable sigmoid binary cross-entropy, mean-reduced."""
    labels = labels.astype(logits.dtype)
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def adversary_loss(logits: jax.Array, labels: jax.Array, n_output: int) -> jax.Array:
    """Attribute-prediction loss: binary (sigmoid BCE, the reference's
    ADV_N_OUTPUT=1 gender setup — model/model.py:348,361) or multiclass
    (softmax CE over n_output classes: race/age debiasing)."""
    if n_output == 1:
        return sigmoid_bce(logits[:, 0], labels)
    return optax.softmax_cross_entropy_with_integer_labels(
        logits, labels.astype(jnp.int32)).mean()


def clip_contrastive_loss(
    image_embs: jax.Array, text_embs: jax.Array, logit_scale: jax.Array
) -> jax.Array:
    """Symmetric InfoNCE over an aligned image–caption batch."""
    img = image_embs / jnp.linalg.norm(image_embs, axis=-1, keepdims=True)
    txt = text_embs / jnp.linalg.norm(text_embs, axis=-1, keepdims=True)
    logits = jnp.exp(logit_scale) * img @ txt.T
    targets = jnp.arange(logits.shape[0])
    li = optax.softmax_cross_entropy_with_integer_labels(logits, targets).mean()
    lt = optax.softmax_cross_entropy_with_integer_labels(logits.T, targets).mean()
    return 0.5 * (li + lt)


def similarity_scores(
    image_embs: jax.Array, prompt_text_embs: jax.Array, logit_scale: jax.Array
) -> jax.Array:
    """Adversary input: scaled cosine similarities [B, n_prompts] between each
    image and the sensitive-prompt set (README.md:152-154)."""
    img = image_embs / jnp.linalg.norm(image_embs, axis=-1, keepdims=True)
    txt = prompt_text_embs / jnp.linalg.norm(prompt_text_embs, axis=-1, keepdims=True)
    return jnp.exp(logit_scale) * img @ txt.T


@dataclasses.dataclass
class TrainStepFns:
    """Jitted step functions bound to a frozen CLIP + static configs."""

    embed_images: Callable  # uint8/float images [B,H,W,3] → [B,D]
    adversary_step: Callable
    prompt_step: Callable
    prompt_step_with_layers: Callable
    prompt_step_text_layers: Callable
    prompt_step_approx_scores: Callable
    eval_scores: Callable


def make_optimizer(peak_lr: float,
                   train_cfg: TrainConfig) -> optax.GradientTransformation:
    """Default optax chain for the adversarial-loop optimizers.

    ``lr_schedule="constant"`` (default) is plain ``adam(peak_lr)`` — the
    update rule every earlier round trained with, bit-identical.  The
    cosine schedules need ``decay_steps`` (TOTAL update steps of the
    optimizer, warmup included); ``run_training`` derives it from
    epochs × steps-per-epoch when the config leaves it None, but a direct
    caller must set it — no silent horizon guessing here.
    ``grad_clip_norm`` chains ``clip_by_global_norm`` before adam.
    """
    sched = train_cfg.lr_schedule
    if sched == "constant":
        lr = peak_lr
    elif sched in ("cosine", "warmup_cosine"):
        if not train_cfg.decay_steps:
            raise ValueError(
                f"lr_schedule={sched!r} needs TrainConfig.decay_steps (total "
                "optimizer update steps); run_training derives it, direct "
                "build_train_steps callers must set it")
        if sched == "cosine":
            if train_cfg.warmup_steps:
                raise ValueError(
                    "warmup_steps is set but lr_schedule='cosine' has no "
                    "warmup phase — use lr_schedule='warmup_cosine'")
            lr = optax.cosine_decay_schedule(peak_lr, train_cfg.decay_steps)
        else:
            if train_cfg.warmup_steps >= train_cfg.decay_steps:
                raise ValueError(
                    f"warmup_steps={train_cfg.warmup_steps} must be < "
                    f"decay_steps={train_cfg.decay_steps}")
            lr = optax.warmup_cosine_decay_schedule(
                0.0, peak_lr, train_cfg.warmup_steps, train_cfg.decay_steps)
    else:
        raise ValueError(
            f"unknown lr_schedule {sched!r} — one of constant/cosine/"
            "warmup_cosine")
    tx = optax.adam(lr)
    if train_cfg.grad_clip_norm is not None:
        tx = optax.chain(
            optax.clip_by_global_norm(train_cfg.grad_clip_norm), tx)
    return tx


def build_train_steps(
    clip_cfg: CLIPConfig,
    debias_cfg: DebiasConfig,
    adv_cfg: AdversaryConfig,
    train_cfg: TrainConfig,
    sensitive_tokens: np.ndarray,
    prompt_optimizer: Optional[optax.GradientTransformation] = None,
    adversary_optimizer: Optional[optax.GradientTransformation] = None,
    use_pallas: Optional[bool] = None,
) -> Tuple[TrainStepFns, optax.GradientTransformation, optax.GradientTransformation]:
    """Build the jitted adversarial steps.

    ``sensitive_tokens``: tokenized sensitive prompts [P_s, 77] (fixed during
    training; the prompt array changes what they encode to).
    """
    if prompt_optimizer is None:
        prompt_optimizer = make_optimizer(train_cfg.prompt_lr, train_cfg)
    if adversary_optimizer is None:
        adv_cfg_sched = train_cfg
        cadence = train_cfg.adversary_steps_per_prompt_step
        if train_cfg.lr_schedule != "constant" and cadence > 1:
            # the adversary takes ``cadence`` update steps per trainer step —
            # an unscaled horizon would hit lr≈0 after 1/cadence of training
            # and freeze the adversary while the prompt keeps moving
            adv_cfg_sched = dataclasses.replace(
                train_cfg,
                warmup_steps=train_cfg.warmup_steps * cadence,
                decay_steps=(train_cfg.decay_steps * cadence
                             if train_cfg.decay_steps else None))
        adversary_optimizer = make_optimizer(train_cfg.adversary_lr,
                                             adv_cfg_sched)

    sensitive_tokens = jnp.asarray(sensitive_tokens, jnp.int32)

    # NB: clip_params is an ARGUMENT of every step (frozen: always wrapped in
    # stop_gradient) — closed-over weights would be baked into the compiled
    # program as constants, which the remote-compile path rejects.
    train_dtype = jnp.dtype(getattr(train_cfg, "train_dtype", "float32"))
    # per-layer jax.checkpoint for differentiable image passes — numerically
    # identical; see TrainConfig.remat_image_tower
    remat_img = bool(getattr(train_cfg, "remat_image_tower", True))

    def encode_sensitive(cp, debias_tokens: jax.Array) -> jax.Array:
        # mixed precision: tower runs at train_dtype, output upcast so the
        # losses/adversary/optimizer always see fp32 (the astype transpose
        # returns fp32 gradients for the fp32 prompt-array leaf)
        return debias_model.encode_text(
            cp, debias_tokens, sensitive_tokens, clip_cfg, debias_cfg,
            use_pallas=use_pallas, dtype=train_dtype,
        ).astype(jnp.float32)

    def encode_captions(cp, debias_tokens, caption_tokens) -> jax.Array:
        return debias_model.encode_text(
            cp, debias_tokens, caption_tokens, clip_cfg, debias_cfg,
            use_pallas=use_pallas, dtype=train_dtype,
        ).astype(jnp.float32)

    embed_dtype_s = str(getattr(train_cfg, "embed_dtype", "float32"))
    if embed_dtype_s == "int8":
        # int8 frozen image tower: exact for training dynamics up to the
        # embedding rounding (the pass takes no gradient).  Weights quantize
        # from the cp argument INSIDE the jitted step, i.e. on every call —
        # deliberate: cp stays the single source of truth, so with-layers
        # configs (which mutate cp["visual"]) never serve stale quantized
        # weights.  Cost: ~430 MB of extra HBM traffic per call (f32 read +
        # int8 write), ≈1 ms at v5e bandwidth vs a ~318 ms step — hoisting
        # to host would save <1% and break the with-layers contract.
        from ..ops.quant import encode_image_vit_q, quantize_vit_visual

        if clip_cfg.vision.kind not in ("vit", "slip_vit"):
            raise NotImplementedError(
                "embed_dtype='int8' supports ViT towers only")

        @jax.jit
        def embed_images(cp, images: jax.Array) -> jax.Array:
            visual_q = quantize_vit_visual(
                jax.lax.stop_gradient(cp)["visual"],
                mean=clip_cfg.vision.image_mean,
                std=clip_cfg.vision.image_std)
            return encode_image_vit_q(
                visual_q, images, clip_cfg.vision).astype(jnp.float32)
    else:
        embed_dtype = jnp.dtype(embed_dtype_s)

        @jax.jit
        def embed_images(cp, images: jax.Array) -> jax.Array:
            """Frozen image tower (both batches use it; no gradient).

            Runs at ``train_cfg.embed_dtype`` — bfloat16 engages the
            fused-block TPU kernels for this no-gradient pass; outputs are
            upcast to fp32 before entering the differentiable steps."""
            return clip_model.encode_image(
                jax.lax.stop_gradient(cp), images, clip_cfg,
                use_pallas=use_pallas, dtype=embed_dtype,
            ).astype(jnp.float32)

    @jax.jit
    def eval_scores(cp, debias_tokens: jax.Array, image_embs: jax.Array) -> jax.Array:
        cp = jax.lax.stop_gradient(cp)
        txt = encode_sensitive(cp, debias_tokens)
        return similarity_scores(image_embs, txt, cp["logit_scale"])

    @functools.partial(jax.jit, donate_argnums=(1,))
    def adversary_step(
        adv_params: Params,
        adv_opt_state,
        scores: jax.Array,
        attr_labels: jax.Array,
    ):
        """Adversary minimizes attribute-prediction BCE (README.md:153).

        Takes precomputed similarity scores: within one outer step the prompt
        array is fixed, so the 319-prompt text tower runs ONCE per outer step
        (fns.eval_scores) instead of once per adversary sub-step."""

        def loss_fn(ap):
            logits = adversary_model.apply_logits(ap, scores)
            return adversary_loss(logits, attr_labels, adv_cfg.n_output)

        loss, grads = jax.value_and_grad(loss_fn)(adv_params)
        updates, adv_opt_state = adversary_optimizer.update(grads, adv_opt_state,
                                                            adv_params)
        adv_params = optax.apply_updates(adv_params, updates)
        return adv_params, adv_opt_state, loss

    def _prompt_losses(cp, deb, adv_params, image_embs, attr_labels,
                       caption_image_embs, caption_tokens):
        # scores computed WITHOUT stop_gradient on cp: in the with-layers
        # variant the adversarial term must reach the unfrozen text layers
        # (the frozen variant stop-gradients cp before calling).  logit_scale
        # is NOT stop-gradiented here — it belongs to the reference's "proj"
        # group, so with freeze_proj=False it must receive gradients (the
        # grad MASK zeroes it in frozen configs; round-3 review fix — the
        # old explicit stop_gradient made freeze_proj=False silently leave
        # logit_scale at init forever)
        txt = encode_sensitive(cp, deb)
        scores = similarity_scores(image_embs, txt, cp["logit_scale"])
        logits = adversary_model.apply_logits(
            jax.lax.stop_gradient(adv_params), scores)
        adv_loss = adversary_loss(logits, attr_labels, adv_cfg.n_output)
        cap_txt = encode_captions(cp, deb, caption_tokens)
        con_loss = clip_contrastive_loss(caption_image_embs, cap_txt,
                                         cp["logit_scale"])
        total = (train_cfg.contrastive_weight * con_loss
                 - train_cfg.adversarial_weight * adv_loss)
        return total, (adv_loss, con_loss)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def prompt_step(
        cp: Params,
        debias_tokens: jax.Array,
        prompt_opt_state,
        adv_params: Params,
        image_embs: jax.Array,
        attr_labels: jax.Array,
        caption_image_embs: jax.Array,
        caption_tokens: jax.Array,
    ):
        """Prompt array maximizes adversary error while keeping CLIP aligned
        via the contrastive loss on image–caption pairs (README.md:153-157)."""
        cp = jax.lax.stop_gradient(cp)

        def loss_fn(deb):
            return _prompt_losses(cp, deb, adv_params, image_embs, attr_labels,
                                  caption_image_embs, caption_tokens)

        (loss, (adv_loss, con_loss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(debias_tokens)
        updates, prompt_opt_state = prompt_optimizer.update(grads, prompt_opt_state,
                                                            debias_tokens)
        debias_tokens = optax.apply_updates(debias_tokens, updates)
        return debias_tokens, prompt_opt_state, {
            "loss": loss, "adv_loss": adv_loss, "contrastive_loss": con_loss,
        }

    def _joint_update(loss_fn, debias_tokens, cp, grad_mask, joint_opt_state):
        """Shared tail of the three joint (prompt, clip) step variants:
        value_and_grad over (tokens, cp), freezing-policy mask multiply,
        one optimizer update, same metrics dict."""
        (loss, (adv_loss, con_loss)), (g_deb, g_cp) = jax.value_and_grad(
            loss_fn, has_aux=True)((debias_tokens, cp))
        g_cp = jax.tree.map(lambda g, m: g * m.astype(g.dtype), g_cp, grad_mask)
        updates, joint_opt_state = prompt_optimizer.update(
            (g_deb, g_cp), joint_opt_state, (debias_tokens, cp))
        debias_tokens, cp = optax.apply_updates((debias_tokens, cp), updates)
        return debias_tokens, cp, joint_opt_state, {
            "loss": loss, "adv_loss": adv_loss, "contrastive_loss": con_loss,
        }

    @functools.partial(jax.jit, donate_argnums=(0, 2))
    def prompt_step_text_layers(
        cp: Params,
        debias_tokens: jax.Array,
        joint_opt_state,
        grad_mask: Params,
        adv_params: Params,
        image_embs: jax.Array,
        attr_labels: jax.Array,
        caption_image_embs: jax.Array,
        caption_tokens: jax.Array,
    ):
        """Layer-training variant for TEXT-side-only configs
        (n_train_vid_layers == 0 and freeze_proj): the image path is fully
        frozen, so its gradients are identically zero — both image batches
        embed ONCE outside the differentiable step (prompt_step's frozen
        embeddings are reused), saving two image-tower fwd+bwd passes per
        step.  Exact, not approximate: same objective and same non-zero
        gradients as prompt_step_with_layers in this configuration."""

        def loss_fn(args):
            deb, cpp = args
            return _prompt_losses(
                cpp, deb, adv_params, jax.lax.stop_gradient(image_embs),
                attr_labels, jax.lax.stop_gradient(caption_image_embs),
                caption_tokens)

        return _joint_update(loss_fn, debias_tokens, cp, grad_mask,
                             joint_opt_state)

    @functools.partial(jax.jit, donate_argnums=(0, 2), static_argnums=())
    def prompt_step_with_layers(
        cp: Params,
        debias_tokens: jax.Array,
        joint_opt_state,
        grad_mask: Params,
        adv_params: Params,
        images: jax.Array,
        attr_labels: jax.Array,
        caption_images: jax.Array,
        caption_tokens: jax.Array,
    ):
        """Variant that also trains the unfrozen CLIP layers: gradients over
        (prompt array, clip params) with the reference's freezing policy
        applied as a multiplier pytree (models/debias.py::trainable_mask —
        replaces requires_grad walking, model/model.py:291-334).

        Unlike the frozen path, BOTH image batches are embedded inside the
        loss so unfrozen image-tower layers receive gradients (costs one
        image fwd+bwd per step — inherent to training vid layers)."""

        def loss_fn(args):
            deb, cpp = args
            image_embs = clip_model.encode_image(
                cpp, images, clip_cfg, use_pallas=use_pallas,
                remat=remat_img).astype(jnp.float32)
            caption_image_embs = clip_model.encode_image(
                cpp, caption_images, clip_cfg, use_pallas=use_pallas,
                remat=remat_img).astype(jnp.float32)
            return _prompt_losses(cpp, deb, adv_params, image_embs, attr_labels,
                                  caption_image_embs, caption_tokens)

        return _joint_update(loss_fn, debias_tokens, cp, grad_mask,
                             joint_opt_state)

    @functools.partial(jax.jit, donate_argnums=(0, 2))
    def prompt_step_approx_scores(
        cp: Params,
        debias_tokens: jax.Array,
        joint_opt_state,
        grad_mask: Params,
        adv_params: Params,
        image_embs: jax.Array,
        attr_labels: jax.Array,
        caption_images: jax.Array,
        caption_tokens: jax.Array,
    ):
        """OPT-IN approximate with-layers step (train_cfg.approx_frozen_scores):
        the adversarial-score term uses the PRECOMPUTED attribute-batch
        embeddings (frozen no-gradient pass, stop-gradient here) even though
        image-path params train; only the caption batch embeds inside the
        loss, for the contrastive term.  Saves one image fwd+bwd per step vs
        prompt_step_with_layers, but the adversary signal reaches image-path
        params only via contrastive alignment — NOT gradient-equivalent
        (except at adversarial_weight=0, pinned in tests)."""

        def loss_fn(args):
            deb, cpp = args
            caption_image_embs = clip_model.encode_image(
                cpp, caption_images, clip_cfg, use_pallas=use_pallas,
                remat=remat_img).astype(jnp.float32)
            return _prompt_losses(
                cpp, deb, adv_params, jax.lax.stop_gradient(image_embs),
                attr_labels, caption_image_embs, caption_tokens)

        return _joint_update(loss_fn, debias_tokens, cp, grad_mask,
                             joint_opt_state)

    fns = TrainStepFns(
        embed_images=embed_images,
        adversary_step=adversary_step,
        prompt_step=prompt_step,
        prompt_step_with_layers=prompt_step_with_layers,
        prompt_step_text_layers=prompt_step_text_layers,
        prompt_step_approx_scores=prompt_step_approx_scores,
        eval_scores=eval_scores,
    )
    return fns, prompt_optimizer, adversary_optimizer


@dataclasses.dataclass
class AdversarialTrainer:
    """Orchestrates the alternating loop with best-NDKL selection.

    Usage:
        trainer = AdversarialTrainer.create(model, adversary, train_cfg,
                                            sensitive_tokens)
        for batch in loader:          # images+labels, and caption pairs
            metrics = trainer.step(images, labels, cap_images, cap_tokens)
        trainer.maybe_update_best(ndkl_value)
    """

    model: debias_model.DebiasCLIP
    adversary_params: Params
    fns: TrainStepFns
    prompt_opt_state: object
    adv_opt_state: object
    train_cfg: TrainConfig
    step_count: int = 0
    best_ndkl: float = float("inf")
    best_tokens: Optional[np.ndarray] = None
    # layer-training mode: the CLIP weights AT the best eval (host copy) —
    # best tokens alone would pair with later weights, a composite whose
    # NDKL was never evaluated (round-3 review fix)
    best_clip_params: Optional[Params] = None
    # set when the debias config unfreezes CLIP layers/projections: the
    # freezing-policy multiplier pytree and a joint (prompt, clip) optimizer
    grad_mask: Optional[Params] = None
    # True when any trainable parameter feeds the image path (vid layers or
    # projections) — selects the full with-layers step; text-only configs
    # take the cheaper prompt_step_text_layers (images embed once, frozen)
    trains_image: bool = False
    # multi-chip data parallelism: batches shard over the mesh's data axis,
    # params/optimizer state replicate; XLA inserts the gradient psums
    mesh: Optional[object] = None

    @staticmethod
    def create(
        model: debias_model.DebiasCLIP,
        adversary,
        train_cfg: TrainConfig,
        sensitive_tokens: np.ndarray,
        use_pallas: Optional[bool] = None,
        mesh=None,
    ) -> "AdversarialTrainer":
        fns, p_opt, a_opt = build_train_steps(
            model.clip_cfg, model.debias_cfg, adversary.cfg,
            train_cfg, sensitive_tokens, use_pallas=use_pallas,
        )
        if mesh is not None:
            # DP embed over the data axis (parallel.mesh.dp_shard_map —
            # keeps the fused pallas kernels per-chip)
            from ..parallel.mesh import dp_shard_map

            inner_embed = fns.embed_images
            fns = dataclasses.replace(
                fns,
                embed_images=dp_shard_map(
                    mesh, lambda cp, images: inner_embed(cp, images)))
        dcfg = model.debias_cfg
        trains_layers = (dcfg.n_train_text_layers > 0
                         or dcfg.n_train_vid_layers > 0
                         or not dcfg.freeze_proj)
        # visual proj (and logit_scale) fall in the reference's "proj"
        # freezing category — image embeddings depend on trainable params
        # iff vid layers or projections are unfrozen
        trains_image = dcfg.n_train_vid_layers > 0 or not dcfg.freeze_proj
        grad_mask = model.trainable_mask() if trains_layers else None
        if trains_layers:
            prompt_opt_state = p_opt.init((model.debias_tokens, model.clip_params))
        else:
            prompt_opt_state = p_opt.init(model.debias_tokens)
        trainer = AdversarialTrainer(
            model=model,
            adversary_params=adversary.params,
            fns=fns,
            prompt_opt_state=prompt_opt_state,
            adv_opt_state=a_opt.init(adversary.params),
            train_cfg=train_cfg,
            grad_mask=grad_mask,
            trains_image=trains_image,
            mesh=mesh,
        )
        if mesh is not None:
            # replicate everything stateful once; batches shard in step()
            from ..parallel.mesh import replicate_params

            trainer.model.clip_params = replicate_params(model.clip_params, mesh)
            trainer.model.debias_tokens = replicate_params(model.debias_tokens, mesh)
            trainer.adversary_params = replicate_params(trainer.adversary_params, mesh)
            trainer.prompt_opt_state = replicate_params(trainer.prompt_opt_state, mesh)
            trainer.adv_opt_state = replicate_params(trainer.adv_opt_state, mesh)
            if trainer.grad_mask is not None:
                trainer.grad_mask = replicate_params(trainer.grad_mask, mesh)
        return trainer

    def _shard(self, x):
        # device arrays pass through untouched (no host round-trip)
        if self.mesh is None:
            return x if isinstance(x, jax.Array) else jnp.asarray(np.asarray(x))
        from ..parallel.mesh import shard_batch_arrays

        return shard_batch_arrays(self.mesh, x)

    def step(self, images, attr_labels, caption_images, caption_tokens) -> Dict:
        """One outer step: K adversary updates, then one prompt update."""
        cp = self.model.clip_params
        image_embs = self.fns.embed_images(cp, self._shard(images))
        # the with-layers / approx branches re-embed caption images INSIDE
        # their differentiable loss — only the frozen branches consume a
        # precomputed caption embed (skipping it saves a full image-tower
        # pass per step in layer-training configs)
        # (branch order below: frozen prompt_step and the text-layers step
        # consume cap_embs; with-layers and approx re-embed internally)
        needs_cap_embs = self.grad_mask is None or not self.trains_image
        cap_embs = (self.fns.embed_images(cp, self._shard(caption_images))
                    if needs_cap_embs else None)
        return self._finish_step(cp, image_embs, cap_embs, attr_labels,
                                 images, caption_images, caption_tokens)

    def step_from_embeddings(self, image_embs, attr_labels,
                             caption_image_embs, caption_tokens) -> Dict:
        """One outer step from PRECOMPUTED frozen-tower embeddings (the
        training loop's embedding cache, TrainConfig.cache_frozen_embeddings):
        identical update arithmetic to ``step`` — the embeddings are the
        same jitted embed program's outputs, gathered instead of recomputed.
        Frozen-image configs only: with trainable image-path params the
        cached rows would go stale after the first update."""
        if self.trains_image:
            raise ValueError(
                "step_from_embeddings requires a frozen image path "
                "(n_train_vid_layers=0 and freeze_proj=True) — this config "
                "trains image-path params, so cached embeddings would be "
                "stale; use step(images, ...) instead")
        cp = self.model.clip_params
        return self._finish_step(
            cp, self._shard(jnp.asarray(image_embs, jnp.float32)),
            self._shard(jnp.asarray(caption_image_embs, jnp.float32)),
            attr_labels, None, None, caption_tokens)

    def _finish_step(self, cp, image_embs, cap_embs, attr_labels,
                     images, caption_images, caption_tokens) -> Dict:
        """Shared tail of step / step_from_embeddings: adversary cadence,
        then the config-selected prompt update.  ``images`` /
        ``caption_images`` (raw pixels) are only consumed by the
        with-layers / approx branches, which are unreachable from
        step_from_embeddings (trains_image guard)."""
        labels = self._shard(np.asarray(attr_labels, np.float32))

        adv_loss = None
        cadence = self.train_cfg.adversary_steps_per_prompt_step
        if cadence < 0:
            raise ValueError(
                f"adversary_steps_per_prompt_step must be >= 0 (0 freezes "
                f"the adversary), got {cadence}")
        if cadence > 0:
            scores = self.fns.eval_scores(cp, self.model.debias_tokens,
                                          image_embs)
            for _ in range(cadence):
                self.adversary_params, self.adv_opt_state, adv_loss = (
                    self.fns.adversary_step(
                        self.adversary_params, self.adv_opt_state, scores,
                        labels))

        cap_tok = self._shard(np.asarray(caption_tokens, np.int32))
        if self.grad_mask is not None and not self.trains_image:
            # text-side layers only: image path frozen, reuse the embeddings
            # computed above (no differentiable image passes)
            (self.model.debias_tokens, self.model.clip_params,
             self.prompt_opt_state, metrics) = self.fns.prompt_step_text_layers(
                cp, self.model.debias_tokens, self.prompt_opt_state,
                self.grad_mask, self.adversary_params, image_embs,
                labels, cap_embs, cap_tok)
        elif self.grad_mask is not None and getattr(
                self.train_cfg, "approx_frozen_scores", False):
            # opt-in approximation: score embeddings stay frozen (reuse the
            # precomputed pass above); only the caption batch re-embeds
            # differentiably — see TrainConfig.approx_frozen_scores
            (self.model.debias_tokens, self.model.clip_params,
             self.prompt_opt_state, metrics) = self.fns.prompt_step_approx_scores(
                cp, self.model.debias_tokens, self.prompt_opt_state,
                self.grad_mask, self.adversary_params, image_embs,
                labels, self._shard(caption_images), cap_tok)
        elif self.grad_mask is not None:
            # raw images go in: the step embeds them differentiably
            # (unreachable from step_from_embeddings — trains_image guard)
            (self.model.debias_tokens, self.model.clip_params,
             self.prompt_opt_state, metrics) = self.fns.prompt_step_with_layers(
                cp, self.model.debias_tokens, self.prompt_opt_state,
                self.grad_mask, self.adversary_params, self._shard(images),
                labels, self._shard(caption_images), cap_tok)
        else:
            self.model.debias_tokens, self.prompt_opt_state, metrics = (
                self.fns.prompt_step(
                    cp, self.model.debias_tokens, self.prompt_opt_state,
                    self.adversary_params, image_embs, labels,
                    cap_embs, cap_tok))
        self.step_count += 1
        metrics = {k: float(v) for k, v in metrics.items()}
        # cadence 0 = frozen adversary: no BCE measured this step
        metrics["adversary_bce"] = (float(adv_loss) if adv_loss is not None
                                    else float("nan"))
        metrics["step"] = self.step_count
        return metrics

    def maybe_update_best(self, ndkl_value: float) -> bool:
        """Best-NDKL model selection (reference checkpoint provenance,
        model/clip.py:16).  Returns True when this eval is the new best.

        In layer-training mode the CLIP weights snapshot too (host copy,
        eval-cadence cost): the best debias tokens belong WITH the weights
        they were evaluated against."""
        if ndkl_value < self.best_ndkl:
            self.best_ndkl = ndkl_value
            self.best_tokens = np.asarray(self.model.debias_tokens)
            if self.grad_mask is not None:
                self.best_clip_params = jax.tree.map(
                    np.asarray, self.model.clip_params)
            return True
        return False
